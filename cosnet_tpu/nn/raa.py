"""RGBDSegmentation_RAA — the canonical "resnet_aspp_add" model, flax/NHWC.

Capability parity with reference ``rgbd_segmentation_RAA.py:18-268``:
siamese RGB encoder (R101+ASPP) and siamese depth encoder (R50-shaped+ASPP),
each followed by a gated co-attention block with its own weights; the two
branch outputs are fused by elementwise add → ReLU → per-frame 1×1
classifiers → bilinear upsample to input size → sigmoid.

Faithfully preserved reference quirks (SURVEY.md §"quirks"):
* counterpart (``*_b``) encoder passes are value-stop-gradiented but still
  update BN batch statistics (torch ``no_grad`` does not stop stat updates);
* the gate mask for the counterpart is stop-gradiented (``:178-182``);
* in the *depth* branch only, the counterpart's reduce/bn/weights tail is
  also stop-gradiented (``:240-247``), while the RGB branch's is not;
* the returned ``labels`` is the *counterpart's* aux annotation (the second
  encoder call overwrites the first, ``:143-146``) and is unused by the loss.

The model is staged (``encode`` / ``attend_and_decode``) so multi-reference
inference encodes the target frame ONCE and co-attends it against all N
reference frames in one batched kernel (eval north-star config 3); the
plain ``__call__`` composes the stages and matches the reference exactly.
"""
from typing import Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosnet_tpu.nn.coattention import coattention
from cosnet_tpu.nn.encoders import DepthEncoderResNetASPP, Encoder
from cosnet_tpu.nn.init import conv_kernel_init, make_conv_bias_init, torch_linear_kernel_init
from cosnet_tpu.nn.norm import BatchNorm
from cosnet_tpu.ops.resize import resize_bilinear


def _conv1x1(features, in_ch, use_bias, name, dtype):
    return nn.Conv(
        features,
        (1, 1),
        use_bias=use_bias,
        kernel_init=conv_kernel_init,
        bias_init=make_conv_bias_init(1, 1, in_ch),
        dtype=dtype,
        name=name,
    )


def _conv3x3(features, in_ch, name, dtype):
    return nn.Conv(
        features,
        (3, 3),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        kernel_init=conv_kernel_init,
        dtype=dtype,
        name=name,
    )


class RGBDSegmentationRAA(nn.Module):
    """Full RAA graph. ``__call__(rgbs_a, rgbs_b, depths_a, depths_b, train)``
    returns ``(x1, x2, labels)`` with masks in [N, H, W, 1]."""

    block: Type[nn.Module]
    num_blocks_rgb: Sequence[int] = (3, 4, 23, 3)
    num_blocks_depth: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1
    all_channel: int = 256
    no_grad_for_counterpart: bool = True
    coattention_backend: str = "einsum"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.all_channel
        self.encoder = Encoder(self.block, self.num_blocks_rgb, self.num_classes, dtype=self.dtype)
        self.rgb_similarity_weights = self.param("rgb_similarity_weights", torch_linear_kernel_init, (c, c), jnp.float32)
        self.gate = _conv1x1(1, c, use_bias=False, name="gate", dtype=self.dtype)
        self.reduce_channels_A = _conv3x3(c, 2 * c, "reduce_channels_A", self.dtype)
        self.reduce_channels_B = _conv3x3(c, 2 * c, "reduce_channels_B", self.dtype)
        self.bn_A = BatchNorm(dtype=self.dtype, name="bn_A")
        self.bn_B = BatchNorm(dtype=self.dtype, name="bn_B")

        self.depth_encoder = DepthEncoderResNetASPP(self.block, self.num_blocks_depth, c, dtype=self.dtype)
        self.depth_similarity_weights = self.param("depth_similarity_weights", torch_linear_kernel_init, (c, c), jnp.float32)
        self.depth_gate = _conv1x1(1, c, use_bias=True, name="depth_gate", dtype=self.dtype)
        self.depth_reduce_channels = _conv3x3(c, 2 * c, "depth_reduce_channels", self.dtype)
        self.depth_bn = BatchNorm(dtype=self.dtype, name="depth_bn")
        self.depth_weights = _conv1x1(c, c, use_bias=True, name="depth_weights", dtype=self.dtype)

        self.segmentation_classifier_A = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_A", dtype=self.dtype)
        self.segmentation_classifier_B = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_B", dtype=self.dtype)

    # -- stages ---------------------------------------------------------

    def encode(self, rgbs, depths, train: bool = False):
        """Encoder stage: (rgb features, depth features, aux annotation)."""
        v, annotation = self.encoder(rgbs, train)
        d = self.depth_encoder(depths, train)
        return v, d, annotation

    def attend_and_decode(self, v_a, v_b, d_a, d_b, input_hw, train: bool = False):
        """Co-attention + gated fusion + add-fuse + classify + upsample.

        Counterpart stop-gradient semantics match the reference; feature
        tensors may be pre-broadcast over reference frames (multi-ref path).
        """
        sg = jax.lax.stop_gradient if self.no_grad_for_counterpart else (lambda t: t)
        v_b, d_b = sg(v_b), sg(d_b)

        z_a, z_b = coattention(v_a, v_b, self.rgb_similarity_weights, backend=self.coattention_backend)
        mask_a = nn.sigmoid(self.gate(z_a))
        mask_b = jax.lax.stop_gradient(nn.sigmoid(self.gate(z_b)))  # reference :178-182
        z_a = z_a * mask_a
        z_b = z_b * mask_b
        z_a = self.reduce_channels_A(jnp.concatenate([z_a, v_a], axis=-1))
        z_b = self.reduce_channels_B(jnp.concatenate([z_b, v_b], axis=-1))
        z_a = self.bn_A(z_a, use_running_average=not train)
        z_b = self.bn_B(z_b, use_running_average=not train)

        dz_a, dz_b = coattention(d_a, d_b, self.depth_similarity_weights, backend=self.coattention_backend)
        d_mask_a = nn.sigmoid(self.depth_gate(dz_a))
        d_mask_b = jax.lax.stop_gradient(nn.sigmoid(self.depth_gate(dz_b)))
        dz_a = dz_a * d_mask_a
        dz_b = dz_b * d_mask_b
        dz_a = jnp.concatenate([dz_a, d_a], axis=-1)
        dz_b = jnp.concatenate([dz_b, d_b], axis=-1)
        dz_a = self.depth_weights(self.depth_bn(self.depth_reduce_channels(dz_a), use_running_average=not train))
        # Counterpart tail stop-gradiented in the depth branch only (:240-247);
        # BN stats still update (torch no_grad keeps stat updates).
        dz_b = jax.lax.stop_gradient(
            self.depth_weights(self.depth_bn(self.depth_reduce_channels(dz_b), use_running_average=not train))
        )

        z_a = nn.relu(z_a + dz_a)
        z_b = nn.relu(z_b + dz_b)
        x1 = self.segmentation_classifier_A(z_a)
        x2 = self.segmentation_classifier_B(z_b)
        # Final mask decode in f32 regardless of trunk dtype: bf16's ~8
        # mantissa bits would quantize the sigmoid mask at uint8 scale.
        x1 = nn.sigmoid(resize_bilinear(x1.astype(jnp.float32), input_hw, align_corners=False))
        x2 = nn.sigmoid(resize_bilinear(x2.astype(jnp.float32), input_hw, align_corners=False))
        return x1, x2

    # -- full graph -------------------------------------------------------

    def __call__(self, rgbs_a, rgbs_b, depths_a, depths_b, train: bool = False):
        input_hw = rgbs_a.shape[1:3]
        sg = jax.lax.stop_gradient if self.no_grad_for_counterpart else (lambda t: t)

        # Encoder call order matters for compounding BN stats: a then b
        # (reference :143-148, :197-203); `labels` is the counterpart's aux
        # annotation — quirk preserved (:146).
        v_a, _labels_a = self.encoder(rgbs_a, train)
        v_b, labels = self.encoder(rgbs_b, train)
        labels = sg(labels)
        d_a = self.depth_encoder(depths_a, train)
        d_b = self.depth_encoder(depths_b, train)

        x1, x2 = self.attend_and_decode(v_a, v_b, d_a, d_b, input_hw, train)
        return x1, x2, labels
