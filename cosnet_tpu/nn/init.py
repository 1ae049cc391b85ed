"""Parameter initializers matching the reference's init scheme.

The reference initializes every ``nn.Conv2d`` weight to N(0, 0.01) and every
``nn.BatchNorm2d`` to (scale=1, bias=0) in each module's constructor loop
(``deeplab/residual_net.py:116-121``, ``deeplab/deeplabv3_encoder.py:36-42``,
``rgbd_segmentation_RAA.py:53-62``). Conv biases and Linear layers are left at
torch defaults: U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
"""
import jax.numpy as jnp
from jax import random
from jax.nn import initializers


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """N(0, 0.01) — reference conv-weight init. Shape is HWIO."""
    return random.normal(key, shape, dtype) * 0.01


def torch_conv_bias_init(key, shape, dtype=jnp.float32, kernel_hwio=None):
    """Torch default conv bias: U(-b, b), b = 1/sqrt(in_ch * kh * kw)."""
    if kernel_hwio is None:
        raise ValueError("kernel_hwio required to compute fan_in")
    kh, kw, in_ch, _ = kernel_hwio
    bound = 1.0 / (in_ch * kh * kw) ** 0.5
    return random.uniform(key, shape, dtype, -bound, bound)


def make_conv_bias_init(kh, kw, in_ch):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (in_ch * kh * kw) ** 0.5
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Linear default (kaiming_uniform with a=sqrt(5)): U(-1/sqrt(fan_in), ...).

    flax Dense kernels are [in, out]; fan_in = shape[0].
    """
    bound = 1.0 / shape[0] ** 0.5
    return random.uniform(key, shape, dtype, -bound, bound)


ones = initializers.ones
zeros = initializers.zeros
