"""Multi-reference-frame inference engine.

The reference loops ``sample_range`` times, one forward per reference frame,
averaging the sigmoid masks on the host (``test.py:287-305``). TPU-native
design (BASELINE.json north star): all N reference frames are folded into
the batch axis and the whole ensemble runs as **one** jitted forward — the
co-attention Pallas kernel batches over N in its leading grid dimension —
then the masks are averaged on-device.

In eval mode BN uses running stats, so batching over reference frames is
numerically identical to the reference's sequential loop.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def build_multi_reference_forward(model, n_inputs: int) -> Callable:
    """Returns jitted ``fn(variables, target, searches, target_depth,
    search_depths) -> mask`` where

      target:        [B, H, W, 3]
      searches:      [B, R, H, W, 3]   (R = sample_range reference frames)
      target_depth:  [B, H, W, 1]
      search_depths: [B, R, H, W, 1]

    and the result is the R-averaged frame-A sigmoid mask [B, H, W, 1].
    """

    @jax.jit
    def forward(variables, target, searches, target_depth, search_depths):
        b, r = searches.shape[0], searches.shape[1]
        h, w = target.shape[1:3]

        def fold(x):  # [B, R, ...] -> [B*R, ...]
            return x.reshape((b * r,) + x.shape[2:])

        def tile(x):  # [B, ...] -> [B*R, ...] (repeat each row R times)
            return jnp.repeat(x, r, axis=0)

        if n_inputs == 4:
            out = model.apply(variables, tile(target), fold(searches), tile(target_depth), fold(search_depths), train=False)
        elif n_inputs == 3:
            out = model.apply(variables, tile(target), fold(searches), tile(target_depth), train=False)
        else:
            out = model.apply(variables, tile(target), fold(searches), train=False)
        x1 = out[0]  # [B*R, H, W, 1]
        return jnp.mean(x1.reshape(b, r, h, w, -1), axis=1)

    return forward
