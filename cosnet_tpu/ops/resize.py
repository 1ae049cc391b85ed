"""Bilinear resize with PyTorch-compatible semantics, NHWC layout, TPU-first.

The reference uses two bilinear conventions (SURVEY.md §7 hard part c):

* ``F.upsample(x, size, mode='bilinear')`` with default ``align_corners=False``
  (half-pixel centers) for the final ×8 mask upsample
  (``rgbd_segmentation_RAA.py:262-263``) and the encoder's aux-annotation
  upsample (``deeplab/deeplabv3_encoder.py:140``);
* ``align_corners=True`` inside ASPP's pooling branch
  (``deeplab/deeplabv3_encoder.py:61``) — degenerate (1×1 source ⇒ constant).

TPU design: instead of gathers, the resize is expressed as two dense
separable contractions ``out = W_h · x · W_wᵀ`` with interpolation-weight
matrices built host-side at trace time. Both contractions run on the MXU and
reproduce torch's (non-antialiased) kernel weights exactly — unlike
``jax.image.resize``, which antialiases when downsampling.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _weight_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic bilinear interpolation matrix (torch weights)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * ((in_size - 1) / (out_size - 1)) if out_size > 1 else np.zeros_like(i)
    else:
        src = (i + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    idx = np.arange(out_size)
    np.add.at(m, (idx, lo), (1.0 - w).astype(np.float32))
    np.add.at(m, (idx, hi), w.astype(np.float32))
    return m


def resize_bilinear(x: jax.Array, out_hw, align_corners: bool = False) -> jax.Array:
    """Resize NHWC / HWC / HW array to ``out_hw`` with torch bilinear semantics."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    elif x.ndim != 4:
        raise ValueError(f"unsupported rank {x.ndim}")

    n, in_h, in_w, c = x.shape
    if (in_h, in_w) != (out_h, out_w):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        if in_h == 1 and in_w == 1:
            xf = jnp.broadcast_to(xf, (n, out_h, out_w, c))
        else:
            if in_h != out_h:
                mh = jnp.asarray(_weight_matrix(in_h, out_h, align_corners))
                xf = jnp.einsum("oh,nhwc->nowc", mh, xf, preferred_element_type=jnp.float32)
            if in_w != out_w:
                mw = jnp.asarray(_weight_matrix(in_w, out_w, align_corners))
                xf = jnp.einsum("ow,nhwc->nhoc", mw, xf, preferred_element_type=jnp.float32)
        x = xf.astype(dtype)

    if squeeze == [0, -1]:
        return x[0, :, :, 0]
    if squeeze == [0]:
        return x[0]
    return x
