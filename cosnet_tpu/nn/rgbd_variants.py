"""Depth-fusion ablation family (``add``/``conc1``/``conc2``/``padd``/
``conv_add``/``conv_conc2``).

The reference's ``RGBDSegmentationModel`` source file is **absent from the
snapshot** (imported at ``test.py:42``, registry at ``test.py:192-206``);
only its call signature survives: ``model(target_rgb, search_rgb,
target_depth)`` — depth for the *target frame only* (``test.py:294-295``).
The family is re-derived here around the documented structure:

* depth encoder: ResNet+ASPP for ``add``/``conc1``/``conc2`` (blocks
  [3,4,6,3], like raa), or the plain-conv encoder for ``padd``/``conv_*``
  (whose parameter list survives in ``train.py:305-311``: conv1/bn1/conv2/
  bn2 + depth_gate + depth_weight — matching the commented-out
  ``DepthEncoderDecoder_PlainConvs`` in ``deeplabv3_encoder.py:233-266``);
* gated depth features ``D̂ = depth_weight(D) · σ(depth_gate(D))``;
* fusion point per approach: before co-attention (``add``: V_a+D̂;
  ``conc1``: 1×1-reduce[V_a‖D̂]), or after (``conc2``: reduce[Z‖V‖D̂];
  ``padd``: Z_a+D̂).

These are capability re-derivations, not ports — the exact reference
weights for this family cannot be imported (no source to define the schema).
"""
from typing import Optional, Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosnet_tpu.nn.coattention import coattention
from cosnet_tpu.nn.encoders import DepthEncoderResNetASPP, Encoder
from cosnet_tpu.nn.init import torch_linear_kernel_init
from cosnet_tpu.nn.raa import _conv1x1, _conv3x3
from cosnet_tpu.nn.resnet import _bn
from cosnet_tpu.ops.resize import resize_bilinear


class PlainConvDepthEncoder(nn.Module):
    """2×(3×3 conv/BN/ReLU) depth encoder (deeplabv3_encoder.py:233-266)."""

    output_channels: int = 256
    inner_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        z = _conv3x3(self.inner_channels, 1, "conv1", self.dtype)(x)
        z = nn.relu(_bn("bn1", self.dtype)(z, use_running_average=not train))
        z = _conv3x3(self.output_channels, self.inner_channels, "conv2", self.dtype)(z)
        z = nn.relu(_bn("bn2", self.dtype)(z, use_running_average=not train))
        return z


class RGBDSegmentationModel(nn.Module):
    block: Type[nn.Module]
    num_blocks_rgb: Sequence[int] = (3, 4, 23, 3)
    num_blocks_depth: Optional[Sequence[int]] = (3, 4, 6, 3)
    num_classes: int = 1
    approach_for_depth: str = "add"  # add | conc1 | conc2 | padd | conv_add | conv_conc2
    all_channel: int = 256
    no_grad_for_counterpart: bool = True
    coattention_backend: str = "einsum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgbs_a, rgbs_b, depths_a, train: bool = False):
        input_hw = rgbs_a.shape[1:3]
        c = self.all_channel
        approach = self.approach_for_depth
        sg = jax.lax.stop_gradient if self.no_grad_for_counterpart else (lambda t: t)

        encoder = Encoder(self.block, self.num_blocks_rgb, self.num_classes, dtype=self.dtype, name="encoder")
        v_a, _ = encoder(rgbs_a, train)
        v_b, labels = encoder(rgbs_b, train)
        v_b, labels = sg(v_b), sg(labels)

        # Depth features for the target frame, gated (train.py:305-311 schema).
        if approach in ("padd", "conv_add", "conv_conc2"):
            depth_encoder = PlainConvDepthEncoder(c, dtype=self.dtype, name="depth_encoder")
        else:
            depth_encoder = DepthEncoderResNetASPP(self.block, self.num_blocks_depth, c, dtype=self.dtype, name="depth_encoder")
        d = depth_encoder(depths_a, train)
        if d.shape[1:3] != v_a.shape[1:3]:
            d = resize_bilinear(d, v_a.shape[1:3], align_corners=False)
        d = _conv1x1(c, c, use_bias=True, name="depth_weight", dtype=self.dtype)(d)
        d = d * nn.sigmoid(_conv1x1(1, c, use_bias=True, name="depth_gate", dtype=self.dtype)(d))

        if approach in ("add", "conv_add"):
            v_a = v_a + d
        elif approach == "conc1":
            v_a = _conv1x1(c, 2 * c, use_bias=False, name="depth_reduce", dtype=self.dtype)(
                jnp.concatenate([v_a, d], -1)
            )

        w = self.param("rgb_similarity_weights", torch_linear_kernel_init, (c, c), jnp.float32)
        z_a, z_b = coattention(v_a, v_b, w, backend=self.coattention_backend)

        gate = _conv1x1(1, c, use_bias=False, name="gate", dtype=self.dtype)
        z_a = z_a * nn.sigmoid(gate(z_a))
        z_b = z_b * jax.lax.stop_gradient(nn.sigmoid(gate(z_b)))

        if approach in ("conc2", "conv_conc2"):
            z_a = _conv3x3(c, 3 * c, "reduce_channels_A3", self.dtype)(jnp.concatenate([z_a, v_a, d], -1))
        else:
            z_a = _conv3x3(c, 2 * c, "reduce_channels_A", self.dtype)(jnp.concatenate([z_a, v_a], -1))
        z_b = _conv3x3(c, 2 * c, "reduce_channels_B", self.dtype)(jnp.concatenate([z_b, v_b], -1))
        z_a = _bn("bn_A", self.dtype)(z_a, use_running_average=not train)
        z_b = _bn("bn_B", self.dtype)(z_b, use_running_average=not train)

        if approach == "padd":
            z_a = z_a + d

        z_a, z_b = nn.relu(z_a), nn.relu(z_b)

        x1 = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_A", dtype=self.dtype)(z_a)
        x2 = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_B", dtype=self.dtype)(z_b)
        x1 = nn.sigmoid(resize_bilinear(x1, input_hw, align_corners=False))
        x2 = nn.sigmoid(resize_bilinear(x2, input_hw, align_corners=False))
        return x1, x2, labels
