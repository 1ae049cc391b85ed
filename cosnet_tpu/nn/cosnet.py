"""RGB-only co-attention siamese network (the ``ori``/``ref`` model family).

The reference imports ``CoattentionNet`` / ``CoattentionSiameseNet``
(``test.py:43-44``) but their source files are **absent from the snapshot**
(SURVEY.md §0). Per the survey's guidance, the model is re-derived as the
RGB half of ``resnet_aspp_add`` — which *is* the original COSNet co-attention
module: siamese R101+ASPP encoder → channel co-attention with gated fusion →
per-frame classifiers → ×8 bilinear upsample → sigmoid.

Module names match the canonical RAA schema (``rgb_similarity_weights``,
``reduce_channels_A/B``, ``bn_A/B``, ``segmentation_classifier_A/B``) so the
reference's ``co_attention.pth`` lineage imports through the same remap
table (``rgbd_segmentation_RAA.py:114-134``).
"""
from typing import Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosnet_tpu.nn.coattention import coattention
from cosnet_tpu.nn.encoders import Encoder
from cosnet_tpu.nn.init import torch_linear_kernel_init
from cosnet_tpu.nn.raa import _conv1x1, _conv3x3
from cosnet_tpu.nn.resnet import _bn
from cosnet_tpu.ops.resize import resize_bilinear


class CoattentionSiameseNet(nn.Module):
    block: Type[nn.Module]
    num_blocks: Sequence[int] = (3, 4, 23, 3)
    num_classes: int = 1
    all_channel: int = 256
    no_grad_for_counterpart: bool = True
    coattention_backend: str = "einsum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgbs_a, rgbs_b, train: bool = False):
        input_hw = rgbs_a.shape[1:3]
        c = self.all_channel
        sg = jax.lax.stop_gradient if self.no_grad_for_counterpart else (lambda t: t)

        encoder = Encoder(self.block, self.num_blocks, self.num_classes, dtype=self.dtype, name="encoder")
        v_a, _ = encoder(rgbs_a, train)
        v_b, labels = encoder(rgbs_b, train)
        v_b, labels = sg(v_b), sg(labels)

        w = self.param("rgb_similarity_weights", torch_linear_kernel_init, (c, c), jnp.float32)
        z_a, z_b = coattention(v_a, v_b, w, backend=self.coattention_backend)

        gate = _conv1x1(1, c, use_bias=False, name="gate", dtype=self.dtype)
        z_a = z_a * nn.sigmoid(gate(z_a))
        z_b = z_b * jax.lax.stop_gradient(nn.sigmoid(gate(z_b)))

        z_a = _conv3x3(c, 2 * c, "reduce_channels_A", self.dtype)(jnp.concatenate([z_a, v_a], -1))
        z_b = _conv3x3(c, 2 * c, "reduce_channels_B", self.dtype)(jnp.concatenate([z_b, v_b], -1))
        z_a = nn.relu(_bn("bn_A", self.dtype)(z_a, use_running_average=not train))
        z_b = nn.relu(_bn("bn_B", self.dtype)(z_b, use_running_average=not train))

        x1 = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_A", dtype=self.dtype)(z_a)
        x2 = _conv1x1(self.num_classes, c, use_bias=True, name="segmentation_classifier_B", dtype=self.dtype)(z_b)
        x1 = nn.sigmoid(resize_bilinear(x1, input_hw, align_corners=False))
        x2 = nn.sigmoid(resize_bilinear(x2, input_hw, align_corners=False))
        return x1, x2, labels
