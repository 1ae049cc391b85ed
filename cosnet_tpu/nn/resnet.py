"""Dilated ResNet trunk (output-stride 8), flax/NHWC, TPU-first.

Capability parity with the reference's ``deeplab/residual_net.py``:

* ``Bottleneck`` (1-3-1, expansion 4) carries the stride on its *first* 1×1
  conv (reference ``residual_net.py:59`` — note: despite the ResNet-v1.5
  comment there, the code strides conv1, and we match the code).
* Stem: 7×7/s2 conv → BN → ReLU → 3×3/s2 maxpool with ``ceil_mode=True``.
* Layer schedule: layer1 s1, layer2 s2, layer3 s1/dilation 2, layer4
  s1/dilation 4 (``residual_net.py:111-114``) ⇒ output stride 8.
* Every layer's first block has a 1×1-conv + BN downsample whose BN affine
  params are frozen (``residual_net.py:127-133``); freezing is implemented in
  the optimizer mask (see ``cosnet_tpu/train/optim.py``) keyed on the
  ``downsample_bn`` param-path name.

All convs lower to XLA:TPU convolutions on the MXU; there is no torch here.
"""
from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from cosnet_tpu.nn.init import conv_kernel_init
from cosnet_tpu.nn.norm import BatchNorm
from cosnet_tpu.ops.pooling import max_pool_ceil


def _bn(name: str, dtype=jnp.float32):
    return BatchNorm(momentum=0.1, epsilon=1e-5, dtype=dtype, name=name)


def _conv(features, kernel, stride=1, dilation=1, padding=0, use_bias=False, name=None, dtype=jnp.float32):
    from cosnet_tpu.nn import quant

    cls = quant.QuantConv if quant.int8_enabled() else nn.Conv
    return cls(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        kernel_init=conv_kernel_init,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """2×(3×3) residual block, expansion 1 (reference ``residual_net.py:15-44``)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        xs = x
        if self.has_downsample:
            # conv1 and downsample_conv consume the same input: quantize it
            # once (int8-static; no-op otherwise) — nn/quant.py::shared_quantize
            from cosnet_tpu.nn import quant

            xs = quant.shared_quantize(self, x)
        out = _conv(self.planes, 3, self.stride, padding=1, name="conv1", dtype=self.dtype)(xs)
        out = _bn("bn1", self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, padding=1, name="conv2", dtype=self.dtype)(out)
        out = _bn("bn2", self.dtype)(out, use_running_average=not train)
        if self.has_downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, name="downsample_conv", dtype=self.dtype)(xs)
            identity = _bn("downsample_bn", self.dtype)(identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1-3-1 bottleneck, expansion 4, stride on conv1, dilation on conv2
    (reference ``residual_net.py:47-96``)."""

    planes: int  # the "shrank" width; block output is planes * 4
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        xs = x
        if self.has_downsample:
            # conv1 and downsample_conv consume the same input: quantize it
            # once (int8-static; no-op otherwise) — nn/quant.py::shared_quantize
            from cosnet_tpu.nn import quant

            xs = quant.shared_quantize(self, x)
        out = _conv(self.planes, 1, self.stride, name="conv1", dtype=self.dtype)(xs)
        out = _bn("bn1", self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, dilation=self.dilation, padding=self.dilation, name="conv2", dtype=self.dtype)(out)
        out = _bn("bn2", self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, name="conv3", dtype=self.dtype)(out)
        out = _bn("bn3", self.dtype)(out, use_running_average=not train)
        if self.has_downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, name="downsample_conv", dtype=self.dtype)(xs)
            identity = _bn("downsample_bn", self.dtype)(identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Partial ResNet trunk: stem + 4 stages, no head (``residual_net.py:100-172``).

    ``num_blocks`` of [3,4,23,3] with Bottleneck = the R101 RGB trunk;
    [3,4,6,3] = the R50-shaped depth trunk.
    """

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        z = _conv(64, 7, 2, padding=3, name="conv1", dtype=self.dtype)(x)
        z = _bn("bn1", self.dtype)(z, use_running_average=not train)
        z = nn.relu(z)
        z = max_pool_ceil(z, kernel=3, stride=2, padding=1)

        specs = [  # (planes, stride, dilation) per stage — residual_net.py:111-114
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        inner = 64
        for li, ((planes, stride, dilation), n_blocks) in enumerate(zip(specs, self.num_blocks), start=1):
            for bi in range(n_blocks):
                has_ds = bi == 0 and (
                    stride != 1 or inner != planes * self.block.expansion or dilation in (2, 4)
                )
                z = self.block(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    has_downsample=has_ds,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(z, train)
                if bi == 0:
                    inner = planes * self.block.expansion
        return z  # [N, H/8(ceil), W/8(ceil), 512*expansion]
