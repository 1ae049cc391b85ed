"""Model-variant family: RGB-only co-attention net + depth-fusion ablations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosnet_tpu.models import create_model, init_variables, model_input_signature
from cosnet_tpu.nn.cosnet import CoattentionSiameseNet
from cosnet_tpu.nn.resnet import Bottleneck
from cosnet_tpu.utils.torch_import import merge_variables, state_dict_to_variables, unmatched_paths

BLOCKS = [1, 1, 1, 1]


def test_rgb_only_coattention_forward():
    model = CoattentionSiameseNet(block=Bottleneck, num_blocks=BLOCKS)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    v = model.init(jax.random.key(0), a, b, train=False)
    x1, x2, labels = model.apply(v, a, b, train=False)
    assert x1.shape == (2, 32, 32, 1) and x2.shape == (2, 32, 32, 1)
    assert float(x1.min()) >= 0.0 and float(x1.max()) <= 1.0


def test_rgb_only_net_accepts_coattention_lineage_checkpoint():
    """The ori-lineage key schema (linear_e, conv1/2, bn1/2, main_classifier1/2,
    encoder.* without .backbone) must import through the same remap table."""
    model = CoattentionSiameseNet(block=Bottleneck, num_blocks=BLOCKS)
    dummy = jnp.zeros((1, 16, 16, 3))
    v = model.init(jax.random.key(0), dummy, dummy, train=False)

    # Build a fake lineage state_dict from our own export-side names.
    rng = np.random.default_rng(1)
    lineage = {
        "module.linear_e.weight": rng.standard_normal((256, 256)).astype(np.float32),
        "module.gate.weight": rng.standard_normal((1, 256, 1, 1)).astype(np.float32),
        "module.conv1.weight": rng.standard_normal((256, 512, 3, 3)).astype(np.float32),
        "module.bn1.weight": rng.standard_normal(256).astype(np.float32),
        "module.bn1.bias": rng.standard_normal(256).astype(np.float32),
        "module.bn1.running_mean": rng.standard_normal(256).astype(np.float32),
        "module.bn1.running_var": np.abs(rng.standard_normal(256)).astype(np.float32),
        "module.main_classifier1.weight": rng.standard_normal((1, 256, 1, 1)).astype(np.float32),
        "module.main_classifier1.bias": rng.standard_normal(1).astype(np.float32),
    }
    imported = state_dict_to_variables(lineage)
    assert not unmatched_paths(v, imported)
    merged = {
        "params": merge_variables(v["params"], imported["params"]),
        "batch_stats": merge_variables(v["batch_stats"], imported["batch_stats"]),
    }
    got = np.asarray(merged["params"]["rgb_similarity_weights"])
    np.testing.assert_array_equal(got, lineage["module.linear_e.weight"].T)
    got_bn = np.asarray(merged["batch_stats"]["bn_A"]["mean"])
    np.testing.assert_array_equal(got_bn, lineage["module.bn1.running_mean"])


@pytest.mark.parametrize("approach", ["add", "conc1", "conc2", "padd", "conv_add", "conv_conc2"])
def test_rgbd_variant_forward(approach):
    from cosnet_tpu.nn.rgbd_variants import RGBDSegmentationModel

    blocks_d = None if approach in ("padd", "conv_add", "conv_conc2") else BLOCKS
    model = RGBDSegmentationModel(
        block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=blocks_d, approach_for_depth=approach
    )
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((1, 32, 32, 1), dtype=np.float32))
    v = model.init(jax.random.key(0), a, b, d, train=False)
    x1, x2, _ = model.apply(v, a, b, d, train=False)
    assert x1.shape == (1, 32, 32, 1) and x2.shape == (1, 32, 32, 1)


def test_registry_covers_reference_model_names():
    from cosnet_tpu.config import MODEL_ABBREVIATIONS

    assert model_input_signature("resnet_aspp_add") == 4
    assert model_input_signature("original_coattention_rgb") == 2
    assert model_input_signature("added_depth_rgbd") == 3
    # every registry abbreviation resolves (reference test.py:180-206)
    for abbr in ["ori", "retrain", "ref", "raa", "add", "conc1", "conc2", "padd", "conv_add", "conv_conc2"]:
        assert abbr in MODEL_ABBREVIATIONS


def test_get_params_subsets():
    from cosnet_tpu.models import get_params
    from cosnet_tpu.nn.raa import RGBDSegmentationRAA
    import jax

    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    dummy = [jnp.zeros((1, 16, 16, 3))] * 2 + [jnp.zeros((1, 16, 16, 1))] * 2
    params = model.init(jax.random.key(0), *dummy, train=False)["params"]
    assert get_params(params, "none") == {}
    assert set(get_params(params, "encoder")) == {"encoder"}
    assert "depth_encoder" in get_params(params, "depth")
    assert set(get_params(params, "all")) == set(params)
    # the 10x group == rgb_attention + depth + decoder covers everything but encoder
    ten_x = {**get_params(params, "rgb_attention"), **get_params(params, "depth"), **get_params(params, "decoder")}
    assert set(ten_x) | {"encoder"} == set(params)


def test_alt_depth_encoder_forward():
    """DepthEncoderResNet — the unused-alternative encoder (reference
    deeplabv3_encoder.py:191-229) kept for capability parity."""
    from cosnet_tpu.nn.encoders import DepthEncoderResNet

    model = DepthEncoderResNet(block=Bottleneck, num_blocks=BLOCKS, output_channels=64)
    x = jnp.zeros((1, 32, 32, 1))
    v = model.init(jax.random.key(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 5, 5, 64)  # os=8 with ceil-mode stem: 32 -> 16 -> 9 -> 5


def test_basicblock_resnet_works():
    """ResNet(BasicBlock) — note: the reference's own _make_layer crashes
    with BasicBlock (downsample is None for layer1 yet its BN-freeze loop
    dereferences it, residual_net.py:127-133); ours handles it."""
    from cosnet_tpu.nn.resnet import BasicBlock, ResNet

    model = ResNet(BasicBlock, [1, 1, 1, 1])
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.key(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 5, 5, 512)  # expansion 1: 512 channels at os=8(ceil)
    # layer1 first block has no downsample (stride 1, 64 == 64*expansion)
    assert "downsample_conv" not in v["params"]["layer1_0"]
