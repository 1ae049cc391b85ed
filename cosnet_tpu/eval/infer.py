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

from typing import Callable

import jax
import jax.numpy as jnp


def build_multi_reference_forward(model, n_inputs: int, as_uint8: bool = False) -> Callable:
    """Returns jitted ``fn(variables, target, searches, target_depth,
    search_depths) -> mask`` where

      target:        [B, H, W, 3]
      searches:      [B, R, H, W, 3]   (R = sample_range reference frames)
      target_depth:  [B, H, W, 1]
      search_depths: [B, R, H, W, 1]

    and the result is the R-averaged frame-A sigmoid mask [B, H, W, 1].
    """

    staged = n_inputs == 4 and hasattr(model, "encode") and hasattr(model, "attend_and_decode")

    @jax.jit
    def forward(variables, target, searches, target_depth, search_depths):
        b, r = searches.shape[0], searches.shape[1]
        h, w = target.shape[1:3]

        def fold(x):  # [B, R, ...] -> [B*R, ...]
            return x.reshape((b * r,) + x.shape[2:])

        def tile(x):  # [B, ...] -> [B*R, ...] (repeat each row R times)
            return jnp.repeat(x, r, axis=0)

        if staged:
            # Shared-target path: encode the target frame ONCE (the encoders
            # are ~2/3 of the FLOPs), broadcast its features over the R
            # reference frames, and run one batched co-attention + decode.
            # Numerically identical to the tiled path in eval mode.
            v_a, d_a, _ = model.apply(variables, target, target_depth, train=False, method="encode")
            v_b, d_b, _ = model.apply(variables, fold(searches), fold(search_depths), train=False, method="encode")
            x1, _ = model.apply(
                variables,
                tile(v_a), v_b, tile(d_a), d_b, (h, w),
                train=False,
                method="attend_and_decode",
            )
        elif n_inputs == 4:
            out = model.apply(variables, tile(target), fold(searches), tile(target_depth), fold(search_depths), train=False)
            x1 = out[0]
        elif n_inputs == 3:
            out = model.apply(variables, tile(target), fold(searches), tile(target_depth), train=False)
            x1 = out[0]
        else:
            out = model.apply(variables, tile(target), fold(searches), train=False)
            x1 = out[0]
        mask = jnp.mean(x1.reshape(b, r, h, w, -1), axis=1)
        if as_uint8:
            # (mask*255).astype(uint8) on-device: same arithmetic as the
            # reference's host conversion (test.py:317), 4x less D2H traffic
            # (the tunneled relay moves ~30 MB/s). Only valid when no float
            # resize follows (output_WH == model input size — all reference
            # eval configs).
            mask = (mask * 255.0).astype(jnp.uint8)
        return mask

    return forward
