"""ASPP head (Atrous Spatial Pyramid Pooling), flax/NHWC.

Capability parity with reference ``deeplab/deeplabv3_encoder.py:10-86``:
five parallel branches — global-pool→1×1→BN→ReLU→broadcast, a 1×1 branch,
and three 3×3 atrous branches (rates per encoder: 6/12/18 for RGB,
2/3/7 for depth) — concatenated (5×depth channels) into a 3×3 bottleneck
→ BN → PReLU. The pooled branch's ``align_corners=True`` bilinear upsample
(reference ``:61``) is a constant broadcast since the source is 1×1.

On TPU the five branches are independent convs over the same input; XLA
fuses the elementwise BN/ReLU tails into the conv epilogues.
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosnet_tpu.nn.init import conv_kernel_init, make_conv_bias_init
from cosnet_tpu.nn.resnet import _bn


class _SplitInputConv(nn.Module):
    """3×3 conv over the concatenation of N branches WITHOUT materializing
    the concatenated tensor: conv(concat(b_i), W) == Σ conv(b_i, W_i) with
    the kernel split along input channels. The 5-way ASPP concat otherwise
    writes+reads a [N,h,w,5·depth] tensor (≈0.5 GB per encoder call at
    480×854 batch 8 — 28% of step time in the xplane trace). Parameter
    layout is the single fused kernel, so checkpoint import is unchanged.
    """

    features: int
    in_channels: int  # total, across branches
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, branches):
        kernel = self.param("kernel", conv_kernel_init, (3, 3, self.in_channels, self.features), jnp.float32)
        bias = self.param("bias", make_conv_bias_init(3, 3, self.in_channels), (self.features,), jnp.float32)
        out = None
        offset = 0
        for b in branches:
            ci = b.shape[-1]
            k = jax.lax.slice_in_dim(kernel, offset, offset + ci, axis=2).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                b.astype(self.dtype), k,
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
            offset += ci
        return out + bias.astype(self.dtype)


def _biased_conv(features, kernel, in_ch, dilation=1, padding=0, name=None, dtype=jnp.float32):
    """Conv with torch-default bias init (reference leaves conv biases at default)."""
    from cosnet_tpu.nn import quant

    cls = quant.QuantConv if quant.int8_enabled() else nn.Conv
    return cls(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=True,
        kernel_init=conv_kernel_init,
        bias_init=make_conv_bias_init(kernel, kernel, in_ch),
        dtype=dtype,
        name=name,
    )


class ASPP(nn.Module):
    input_channels: int = 2048
    output_channels: int = 256
    depth: int = 512
    dilations: Sequence[int] = (6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        n, h, w, _ = x.shape
        ra = not train

        # Branch 0: image-level pooling (reference :57-61).
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)  # [N,1,1,Cin]
        pooled = _biased_conv(self.depth, 1, self.input_channels, name="conv", dtype=self.dtype)(pooled)
        pooled = _bn("bn_x", self.dtype)(pooled, use_running_average=ra)
        pooled = nn.relu(pooled)
        pooled = jnp.broadcast_to(pooled, (n, h, w, self.depth))

        # int8-static: quantize the 2048-ch trunk output ONCE for the four
        # big branch convs — per-site scales made the compiled graph write
        # EIGHT s8 copies of this tensor (nn/quant.py::shared_quantize).
        from cosnet_tpu.nn import quant

        xs = quant.shared_quantize(self, x)

        # Branch 1: 1x1 (reference :63-65).
        out0 = _biased_conv(self.depth, 1, self.input_channels, name="conv2d_0", dtype=self.dtype)(xs)
        out0 = _bn("bn_0", self.dtype)(out0, use_running_average=ra)
        out0 = nn.relu(out0)

        # Branches 2-4: 3x3 atrous (reference :67-77).
        atrous = []
        for i, d in enumerate(self.dilations):
            o = _biased_conv(self.depth, 3, self.input_channels, dilation=d, padding=d, name=f"conv2d_{i+1}", dtype=self.dtype)(xs)
            o = _bn(f"bn_{i+1}", self.dtype)(o, use_running_average=ra)
            atrous.append(nn.relu(o))

        # conv-over-concat without the concat (branch-split kernel).
        out = _SplitInputConv(self.output_channels, self.depth * 5, dtype=self.dtype, name="bottleneck")(
            [pooled, out0, *atrous]
        )
        out = _bn("bn", self.dtype)(out, use_running_average=ra)
        # PReLU with torch-default single shared 0.25 slope (reference :33,82).
        out = nn.PReLU(negative_slope_init=0.25, name="prelu")(out)
        return out
