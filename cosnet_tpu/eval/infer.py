"""Multi-reference-frame inference engine.

The reference loops ``sample_range`` times, one forward per reference frame,
averaging the sigmoid masks on the host (``test.py:287-305``). TPU-native
design (BASELINE.json north star): all N reference frames are folded into
the batch axis and the whole ensemble runs as **one** jitted forward — the
co-attention Pallas kernel batches over N in its leading grid dimension —
then the masks are averaged on-device.

In eval mode BN uses running stats, so batching over reference frames is
numerically identical to the reference's sequential loop.

Two input forms share the ensemble body: preprocessed float frames
(:func:`build_multi_reference_forward`) and raw ROI-cropped uint8 source
frames whose resize/mean-sub run on device inside the same jit
(:func:`build_multi_reference_forward_raw` — the transfer-bound eval loop's
~10x H2D reduction; see data/device_preprocess.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _ensemble(model, n_inputs, variables, target, searches, target_depth,
              search_depths, as_uint8):
    """R-averaged frame-A sigmoid mask of one batch (shapes in the builders)."""
    staged = n_inputs == 4 and hasattr(model, "encode") and hasattr(model, "attend_and_decode")
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


def build_multi_reference_forward(model, n_inputs: int, as_uint8: bool = False) -> Callable:
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
        return _ensemble(model, n_inputs, variables, target, searches,
                         target_depth, search_depths, as_uint8)

    return forward


def build_multi_reference_forward_raw(model, n_inputs: int, out_hw, meanval,
                                      as_uint8: bool = False,
                                      stage_dtype=None) -> Callable:
    """Raw-input variant: jitted ``fn(variables, target_u8, searches_u8,
    target_depth_u8, search_depths_u8, target_hw, search_hws) -> mask`` where

      target_u8:         [B, Hh, Wh, 3] uint8  (ROI-cropped source, padded)
      searches_u8:       [B, R, Hh, Wh, 3] uint8
      target_depth_u8:   [B, Hh, Wh] uint8
      search_depths_u8:  [B, R, Hh, Wh] uint8
      target_hw:         [B, 2] int32  (true crop size inside the hull)
      search_hws:        [B, R, 2] int32

    The cv2-exact resize to ``out_hw`` + BGR mean subtraction run on device
    (data/device_preprocess.py) inside the same jit as the model, then the
    standard ensemble body. ``stage_dtype`` (e.g. bf16) narrows the
    preprocessed activations before they enter the model — same cast its
    first conv would apply.
    """
    body = _raw_body(model, n_inputs, out_hw, meanval, as_uint8, stage_dtype)

    @jax.jit
    def forward(variables, target_u8, searches_u8, target_depth_u8,
                search_depths_u8, target_hw, search_hws):
        return body(variables, target_u8, searches_u8, target_depth_u8,
                    search_depths_u8, target_hw, search_hws)

    return forward


def _raw_body(model, n_inputs, out_hw, meanval, as_uint8, stage_dtype):
    from cosnet_tpu.data.device_preprocess import preprocess_frames

    out_hw = tuple(int(v) for v in out_hw)
    mean = jnp.asarray(meanval, jnp.float32)

    def body(variables, target_u8, searches_u8, target_depth_u8,
             search_depths_u8, target_hw, search_hws):
        b, r = searches_u8.shape[0], searches_u8.shape[1]

        def fold(x):
            return x.reshape((b * r,) + x.shape[2:])

        target, target_depth = preprocess_frames(target_u8, target_depth_u8, target_hw, out_hw, mean)
        s_rgb, s_depth = preprocess_frames(fold(searches_u8), fold(search_depths_u8),
                                           fold(search_hws), out_hw, mean)
        searches = s_rgb.reshape(b, r, *out_hw, 3)
        search_depths = s_depth.reshape(b, r, *out_hw, 1)
        if stage_dtype is not None:
            target, searches = target.astype(stage_dtype), searches.astype(stage_dtype)
            target_depth, search_depths = target_depth.astype(stage_dtype), search_depths.astype(stage_dtype)
        return _ensemble(model, n_inputs, variables, target, searches,
                         target_depth, search_depths, as_uint8)

    return body


def build_multi_reference_forward_pooled(model, n_inputs: int, out_hw, meanval,
                                         as_uint8: bool = False,
                                         stage_dtype=None) -> Callable:
    """Frame-pool variant of the raw forward: jitted ``fn(variables, targets,
    searches, target_depths, search_depths, target_hw, search_hws)`` where

      targets:        tuple of B  [Hh, Wh, 3] uint8 arrays (device-resident)
      searches:       tuple of B  tuples of R [Hh, Wh, 3] uint8 arrays
      target_depths:  tuple of B  [Hh, Wh] uint8 arrays
      search_depths:  tuple of B  tuples of R [Hh, Wh] uint8 arrays
      target_hw:      [B, 2] int32, search_hws: [B, R, 2] int32

    The eval protocol revisits every frame as a counterpart ~R times beyond
    its own target slot (random picks over the sequence, reference
    test.py:287-305 / the loader's ``rng.sample``); shipping the batch
    pre-stacked re-uploads each frame on every visit. Here the per-frame
    arrays live in a device-side pool (eval/runner.py::_DeviceFramePool) and
    are shipped ONCE; the batch stack is built INSIDE the jit (an XLA concat
    over device-resident buffers — zero H2D), then flows through the same
    preprocess + ensemble body as the raw path. Retraces only when (B, R,
    hull) change, exactly like the stacked variant.
    """
    body = _raw_body(model, n_inputs, out_hw, meanval, as_uint8, stage_dtype)

    @jax.jit
    def forward(variables, targets, searches, target_depths, search_depths,
                target_hw, search_hws):
        target_u8 = jnp.stack(targets)
        searches_u8 = jnp.stack([jnp.stack(s) for s in searches])
        target_depth_u8 = jnp.stack(target_depths)
        search_depth_u8 = jnp.stack([jnp.stack(s) for s in search_depths])
        return body(variables, target_u8, searches_u8, target_depth_u8,
                    search_depth_u8, target_hw, search_hws)

    return forward
