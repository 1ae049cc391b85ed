"""Device-side eval preprocessing: uint8 on the wire, resize + mean-sub on TPU.

SURVEY.md §7.6's intended data path ("host decode → pinned staging → device
batched resize/mean-sub") — round 2 shipped fully-preprocessed float32 frames
instead, which made the REAL eval loop transfer-bound: a 480×854 batch-8
input set is 105 MB of f32, and the tunneled relay moves ~35-40 MB/s
(measured; docs/ROADMAP.md). Shipping the ROI-cropped *source* frames as
uint8 is ~10× fewer bytes; the resize and mean subtraction move into the
jitted forward.

Parity: the host path computes ``resize_linear(crop(u8 − mean))`` (cv2
float path — SBM loader order, reference ``sbm_rgbd_loader.py:604-626``).
Bilinear weights sum to exactly 1 per output pixel, so the mean subtraction
commutes with the resample; the device computes ``resize(crop(u8)) − mean``
with the same cv2 INTER_LINEAR sample positions (``src=(i+0.5)·scale−0.5``,
border-clamped — same formula as data/device_augment.py), matching the host
chain to float rounding. Masks are gated bit-level by
tests/test_device_preprocess.py.

Variable crop sizes (the ROI differs per sequence) ride as traced per-sample
(h, w) scalars: frames are zero-padded to one static hull and each resample
matrix is built densely from the traced true size — one compilation covers
every sequence.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _resize_matrix(src_pad: int, out_size: int, src_size, nearest: bool = False):
    """[out_size, src_pad] cv2-exact resample matrix for a row of true length
    ``src_size`` (traced f32 scalar) stored in a ``src_pad`` buffer."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    k = jnp.arange(src_pad, dtype=jnp.float32)[None, :]
    if nearest:
        # cv2 INTER_NEAREST: src = floor(dst·(src/dst)), clamped.
        j = jnp.minimum(jnp.floor(i * src_size / out_size), src_size - 1.0)
        return (k == j[:, None]).astype(jnp.float32)
    # cv2 INTER_LINEAR: src = (dst+0.5)·(src/dst) − 0.5, border-clamped.
    # (2i+1)·src_size is an exact f32 integer (< 2^24 at any model geometry).
    q = jnp.clip((2.0 * i + 1.0) * src_size / (2.0 * out_size) - 0.5, 0.0, src_size - 1.0)
    k0 = jnp.floor(q)
    w1 = q - k0
    k1 = jnp.minimum(k0 + 1.0, src_size - 1.0)
    w = (k == k0[:, None]).astype(jnp.float32) * (1.0 - w1)[:, None]
    return w + (k == k1[:, None]).astype(jnp.float32) * w1[:, None]


@functools.partial(jax.jit, static_argnames=("out_hw",))
def preprocess_frames(rgb_u8, depth_u8, hw, out_hw, meanval):
    """Batched crop-aware resize + mean subtraction.

    Args:
      rgb_u8:   [N, Hp, Wp, 3] uint8 — ROI-cropped source frames, zero-padded
                to the static hull (BGR byte order, as decoded).
      depth_u8: [N, Hp, Wp] uint8 — same geometry.
      hw:       [N, 2] int32 — each sample's true (rows, cols) inside the hull.
      out_hw:   static (H, W) model input size.
      meanval:  [3] f32 BGR mean (subtracted from rgb only, host semantics).

    Returns (rgb [N, H, W, 3] f32, depth [N, H, W, 1] f32).
    """
    meanval = jnp.asarray(meanval, jnp.float32)

    def one(rgb, depth, size):
        mh = _resize_matrix(rgb.shape[0], out_hw[0], size[0].astype(jnp.float32))
        mw = _resize_matrix(rgb.shape[1], out_hw[1], size[1].astype(jnp.float32))
        x = jnp.concatenate([rgb.astype(jnp.float32), depth.astype(jnp.float32)[..., None]], axis=-1)
        # HIGHEST: these contractions must run as true f32 — the default
        # bf16 MXU pass has an 8-bit mantissa, ~1 intensity-level of error
        # on 0..255 pixels (measured 1.3 max vs cv2); with f32 passes the
        # chain matches cv2's float path to ~1e-4.
        x = jnp.einsum("oh,hwc->owc", mh, x, precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("ow,hwc->hoc", mw, x, precision=jax.lax.Precision.HIGHEST)
        return x[..., :3] - meanval, x[..., 3:]

    return jax.vmap(one)(rgb_u8, depth_u8, hw)
