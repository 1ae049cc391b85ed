"""Max pooling with PyTorch ``ceil_mode=True`` semantics, NHWC layout.

The reference ResNet stem uses ``nn.MaxPool2d(kernel_size=3, stride=2,
padding=1, ceil_mode=True)`` (``deeplab/residual_net.py:109``). ``ceil_mode``
changes the output size rule and therefore the spatial dims of every
downstream feature map, so it must be replicated exactly.

Torch's rule: ``out = ceil((in + 2*pad - k) / s) + 1``, except a window is
dropped if it would start entirely inside the right/bottom padding, i.e. if
``(out - 1) * s >= in + pad`` then ``out -= 1``.

Implemented as explicit -inf padding + ``lax.reduce_window`` with VALID
padding so XLA lowers it to a single fused windowed reduce on TPU.
"""
import jax
import jax.numpy as jnp
from jax import lax


def _out_size(in_size: int, k: int, s: int, p: int) -> int:
    out = -((in_size + 2 * p - k) // -s) + 1  # ceil div + 1
    if (out - 1) * s >= in_size + p:
        out -= 1
    return out


def max_pool_ceil(x: jax.Array, kernel: int = 3, stride: int = 2, padding: int = 1) -> jax.Array:
    """NHWC max pool matching torch MaxPool2d(kernel, stride, padding, ceil_mode=True)."""
    n, h, w, c = x.shape
    out_h = _out_size(h, kernel, stride, padding)
    out_w = _out_size(w, kernel, stride, padding)
    # Right/bottom padding so the last VALID window lands where torch's does.
    pad_h_hi = (out_h - 1) * stride - padding + kernel - h
    pad_w_hi = (out_w - 1) * stride - padding + kernel - w
    # -inf (not finfo.min) so JAX recognizes the max-reduce and provides a VJP.
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, max(pad_h_hi, 0)), (padding, max(pad_w_hi, 0)), (0, 0)),
    )
