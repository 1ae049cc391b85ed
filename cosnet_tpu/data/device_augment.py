"""Device-side batched augmentation — the TPU-native training data path.

BASELINE.json north star: replace the OpenCV/numpy host augmentation with a
device-side batched pipeline. The reference's synchronized crop→scale→flip
(``dataloaders/utils.py`` + sharing protocol) is, under static shapes, an
affine resample: crop a ratio-c window at offset o and resample it to the
fixed output size, then optionally mirror. Here that becomes per-sample
bilinear **interpolation matrices** built on device from continuous scalars
(no gathers, no recompiles per ratio):

    out = W_h(offset_y, crop_h) · frame · W_w(offset_x, crop_w)ᵀ

with W[i, j] = max(0, 1 − |src_i − j|), src_i = o + (i+0.5)·(c·S/O) − 0.5 —
exactly the bilinear kernel, evaluated densely on the VPU and contracted on
the MXU. Flip mirrors the source coordinate. The whole batch augments in one
jitted call; RNG semantics (per-batch ratios, per-sample shared offsets,
per-sequence flips) are drawn host-side and passed as arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interp_matrix(src_size: int, out_size: int, offset, crop_size, flip):
    """[out, src] bilinear sampling matrix for a crop window, traced-friendly.

    offset, crop_size: f32 scalars (in source pixels); flip: bool scalar.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    i = jnp.where(flip, out_size - 1.0 - i, i)
    src = offset + (i + 0.5) * (crop_size / out_size) - 0.5
    src = jnp.clip(src, 0.0, src_size - 1.0)
    j = jnp.arange(src_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))
    # Rows where src is integral hit exactly one source pixel; rows sum to 1.
    return w / jnp.sum(w, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("nearest",))
def augment_batch(frames, offsets_yx, crop_ratio, flips, nearest: bool = False):
    """Batched crop+resample(+flip) on device.

    Args:
      frames: [B, H, W, C] f32 (or [B, H, W] for masks).
      offsets_yx: [B, 2] f32 crop offsets in pixels.
      crop_ratio: scalar f32 in (0, 1] — shared per batch (reference
        ``next_batch`` semantics).
      flips: [B] bool — per-sequence flip decisions.
      nearest: snap sampling to nearest-neighbor (gt masks).
    Returns: same-shape batch, augmented.
    """
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[..., None]
    b, h, w, c = frames.shape
    crop_h = crop_ratio * h
    crop_w = crop_ratio * w

    def one(frame, off, flip):
        wh = _interp_matrix(h, h, off[0], crop_h, jnp.asarray(False))
        ww = _interp_matrix(w, w, off[1], crop_w, flip)
        if nearest:
            # Snap each row to its argmax source pixel (nearest neighbor).
            wh = (wh == jnp.max(wh, axis=1, keepdims=True)).astype(jnp.float32)
            wh = wh / jnp.sum(wh, axis=1, keepdims=True)
            ww = (ww == jnp.max(ww, axis=1, keepdims=True)).astype(jnp.float32)
            ww = ww / jnp.sum(ww, axis=1, keepdims=True)
        x = frame.astype(jnp.float32)
        x = jnp.einsum("oh,hwc->owc", wh, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("ow,hwc->hoc", ww, x, preferred_element_type=jnp.float32)
        return x

    out = jax.vmap(one)(frames, offsets_yx.astype(jnp.float32), flips)
    out = out.astype(frames.dtype) if not nearest else (out > 0.5).astype(frames.dtype)
    return out[..., 0] if squeeze else out


def draw_augmentation_params(rng: np.random.Generator, batch_seqs, flip_of_seq: dict, hw):
    """Host-side RNG with the reference's sharing protocol: crop ratio per
    batch (U(0.8,1)), offsets per sample (shared across that sample's
    modalities by construction), flip per sequence (p>0.5 mirrors)."""
    h, w = hw
    crop_ratio = float(rng.uniform(0.8, 1.0))
    offsets = []
    flips = []
    for seq in batch_seqs:
        max_y = h - int(crop_ratio * h)
        max_x = w - int(crop_ratio * w)
        offsets.append([rng.integers(0, max(max_y, 1)), rng.integers(0, max(max_x, 1))])
        if seq not in flip_of_seq:
            flip_of_seq[seq] = rng.uniform(0, 1)
        flips.append(flip_of_seq[seq] > 0.5)
    return np.asarray(offsets, np.float32), crop_ratio, np.asarray(flips)
