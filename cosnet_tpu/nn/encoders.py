"""RGB and depth encoders: ResNet trunk + ASPP (+ aux classifier), flax/NHWC.

Capability parity with reference ``deeplab/deeplabv3_encoder.py:91-229``:

* ``Encoder`` — RGB: ResNet(3ch) + ASPP(dilations 6/12/18) + 1×1 aux
  classifier whose sigmoid annotation is upsampled to input size
  (``align_corners=False``; the aux branch exists for a train-time loss hook
  and is returned but unused by the reference loss — quirk preserved).
* ``DepthEncoderResNetASPP`` — depth: ResNet(1ch, [3,4,6,3]) + ASPP with the
  deliberately different dilations 2/3/7 (reference ``:156-159``).
* ``DepthEncoderResNet`` — unused alternative: ResNet + 1×1 conv/BN/ReLU
  (reference ``:191-229``), kept for capability parity.
"""
from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from cosnet_tpu.nn.aspp import ASPP, _biased_conv
from cosnet_tpu.nn.resnet import ResNet, _bn
from cosnet_tpu.ops.resize import resize_bilinear


class Encoder(nn.Module):
    """RGB encoder: returns (features [N,h,w,256], annotation [N,H,W,1])."""

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        input_hw = x.shape[1:3]
        features = ResNet(self.block, self.num_blocks, dtype=self.dtype, name="backbone")(x, train)
        features = ASPP(2048, 256, 512, (6, 12, 18), dtype=self.dtype, name="aspp")(features, train)
        annotation = _biased_conv(self.num_classes, 1, 256, name="main_classifier", dtype=self.dtype)(features)
        annotation = resize_bilinear(annotation, input_hw, align_corners=False)
        annotation = nn.sigmoid(annotation)
        return features, annotation


class DepthEncoderResNetASPP(nn.Module):
    """Depth encoder: ResNet(1ch) + ASPP(2/3/7); returns features only."""

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    output_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        features = ResNet(self.block, self.num_blocks, dtype=self.dtype, name="backbone")(x, train)
        features = ASPP(2048, self.output_channels, 512, (2, 3, 7), dtype=self.dtype, name="aspp")(features, train)
        return features


class DepthEncoderResNet(nn.Module):
    """Alternative depth encoder: ResNet + 1×1 conv/BN/ReLU (reference :191-229)."""

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    output_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        features = ResNet(self.block, self.num_blocks, dtype=self.dtype, name="backbone")(x, train)
        features = _biased_conv(self.output_channels, 1, 2048, name="conv", dtype=self.dtype)(features)
        features = _bn("bn", self.dtype)(features, use_running_average=not train)
        return nn.relu(features)
