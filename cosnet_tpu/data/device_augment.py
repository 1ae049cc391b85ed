"""Device-side batched augmentation — the TPU-native training data path.

BASELINE.json north star: replace the OpenCV/numpy host augmentation with a
device-side batched pipeline. The reference's synchronized crop→scale→flip
(``dataloaders/utils.py:18-46`` + sharing protocol ``sbm_rgbd_loader.py:705-722``)
followed by the static-shape resize is a chain of *linear* resamplings, so the
whole chain collapses into one per-sample interpolation matrix per axis:

    out = W_h(offset_y, crop, scale) · frame · W_w(offset_x, crop, scale, flip)ᵀ

W is the exact composition of the three cv2 stages —
crop ``[o, o+int(c·S))`` → resize to ``m = int(int(c·S)·s)`` (INTER_LINEAR:
``src = (i+0.5)·scale − 0.5`` border-clamped; INTER_NEAREST:
``src = floor(i·scale)``) → mirror → resize back to S — evaluated densely on
the VPU from *traced* scalars (no gathers, no recompile when the per-batch
ratios change) and contracted on the MXU. Each matrix row has ≤4 non-zeros
(two bilinear taps through each of the two resample stages); positions are
computed as exact small-integer products (< 2^24, exact in f32), so the
nearest-neighbor (gt mask) chain is bit-faithful to the host path and the
linear chain matches to float rounding.

RNG semantics (crop/scale ratios per batch, offsets per sample shared across
that sample's modalities, flips per sequence) are drawn host-side and passed
as arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _composed_matrix(src_size: int, out_size: int, offset, crop_size, scaled_size, flip, nearest: bool):
    """[out, src] resampling matrix for the cv2 chain
    crop(offset, crop_size) → resize(scaled_size) → flip? → resize(out_size).

    ``offset``, ``crop_size``, ``scaled_size``: traced f32 scalars holding
    integer values; ``flip``: traced bool. Products below stay < 2^24 for all
    model resolutions, so floors are exact in f32.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    k = jnp.arange(src_size, dtype=jnp.float32)[None, :]
    cs, m = crop_size, scaled_size

    if nearest:
        # cv2 INTER_NEAREST: src = floor(dst·(src/dst)), clamped.
        j = jnp.minimum(jnp.floor(i * m / out_size), m - 1.0)
        j = jnp.where(flip, m - 1.0 - j, j)
        p = jnp.minimum(jnp.floor(j * cs / m), cs - 1.0)
        src = jnp.minimum(offset + p, src_size - 1.0)  # defensive border clamp
        return (k == src[:, None]).astype(jnp.float32)

    # cv2 INTER_LINEAR: src = (dst+0.5)·(src/dst) − 0.5, border-clamped.
    # (2i+1)·m is an exact f32 integer; the division is correctly rounded.
    q = jnp.clip((2.0 * i + 1.0) * m / (2.0 * out_size) - 0.5, 0.0, m - 1.0)
    j0 = jnp.floor(q)
    wq = q - j0
    w = jnp.zeros((out_size, src_size), jnp.float32)
    for j, wj in ((j0, 1.0 - wq), (jnp.minimum(j0 + 1.0, m - 1.0), wq)):
        jj = jnp.where(flip, m - 1.0 - j, j)
        p = jnp.clip((2.0 * jj + 1.0) * cs / (2.0 * m) - 0.5, 0.0, cs - 1.0)
        k0 = jnp.floor(p)
        wp = p - k0
        for kk, wk in ((k0, 1.0 - wp), (jnp.minimum(k0 + 1.0, cs - 1.0), wp)):
            src = jnp.minimum(offset + kk, src_size - 1.0)  # defensive border clamp
            w = w + (wj * wk)[:, None] * (k == src[:, None])
    return w


@functools.partial(jax.jit, static_argnames=("nearest",))
def augment_batch(frames, offsets_yx, crop_ratio, scale_ratio, flips, nearest: bool = False):
    """Batched crop→scale→flip(→static resize) on device.

    Args:
      frames: [B, H, W, C] f32 (or [B, H, W] for masks).
      offsets_yx: [B, 2] f32 crop offsets in pixels.
      crop_ratio: scalar f32 in (0, 1] — shared per batch (reference
        ``next_batch`` semantics, U(0.8, 1)).
      scale_ratio: scalar f32 — shared per batch (U(0.7, 1.3)); the zoom
        stage the reference applies between crop and flip
        (``sbm_rgbd_loader.py:713-720``).
      flips: [B] bool — per-sequence flip decisions.
      nearest: use the cv2 INTER_NEAREST chain (gt masks).
    Returns: same-shape batch, augmented.
    """
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[..., None]
    b, h, w, c = frames.shape
    # Host-exact integer geometry: ch = int(c·H), m = int(ch·s).
    ch = jnp.floor(crop_ratio * h)
    cw = jnp.floor(crop_ratio * w)
    mh = jnp.maximum(jnp.floor(ch * scale_ratio), 1.0)
    mw = jnp.maximum(jnp.floor(cw * scale_ratio), 1.0)

    def one(frame, off, flip):
        wh = _composed_matrix(h, h, off[0], ch, mh, jnp.asarray(False), nearest)
        ww = _composed_matrix(w, w, off[1], cw, mw, flip, nearest)
        x = frame.astype(jnp.float32)
        x = jnp.einsum("oh,hwc->owc", wh, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("ow,hwc->hoc", ww, x, preferred_element_type=jnp.float32)
        return x

    out = jax.vmap(one)(frames, offsets_yx.astype(jnp.float32), flips)
    out = out.astype(frames.dtype)
    return out[..., 0] if squeeze else out


def draw_augmentation_params(rng: np.random.Generator, batch_seqs, flip_of_seq: dict, hw, ratios=None):
    """Host-side RNG with the reference's sharing protocol: crop ratio per
    batch (U(0.8, 1)) and scale ratio per batch (U(0.7, 1.3)) — pass the same
    ``ratios`` tuple back in to share them across modality groups of one
    batch — offsets per sample (shared across that sample's modalities by
    construction), flip per sequence (p > 0.5 mirrors).

    Returns (offsets [B,2] f32, crop_ratio, scale_ratio, flips [B] bool).
    """
    h, w = hw
    crop_ratio, scale_ratio = ratios if ratios else (
        float(rng.uniform(0.8, 1.0)), float(rng.uniform(0.7, 1.3)))
    offsets = []
    flips = []
    for seq in batch_seqs:
        max_y = h - int(crop_ratio * h)
        max_x = w - int(crop_ratio * w)
        offsets.append([rng.integers(0, max(max_y, 1)), rng.integers(0, max(max_x, 1))])
        if seq not in flip_of_seq:
            flip_of_seq[seq] = rng.uniform(0, 1)
        flips.append(flip_of_seq[seq] > 0.5)
    return np.asarray(offsets, np.float32), crop_ratio, scale_ratio, np.asarray(flips)
