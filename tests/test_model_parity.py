"""Golden parity: the flax RAA model vs the executed reference (torch, CPU).

The reference model is instantiated with a tiny block config, its state_dict
is imported through the checkpoint shim, and forward outputs must match
numerically in both eval and train (BN batch-stats) modes.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck
from cosnet_tpu.utils.torch_import import merge_variables, state_dict_to_variables, unmatched_paths
from tests._reference import get_reference

BLOCKS = [1, 1, 1, 1]
HW = (64, 64)


@pytest.fixture(scope="module")
def ref_model():
    raa_mod, RefBottleneck = get_reference()
    torch.manual_seed(0)
    m = raa_mod.RGBDSegmentation_RAA(RefBottleneck, BLOCKS, BLOCKS, num_classes=1)
    return m


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(42)
    rgb_a = rng.standard_normal((2, 3, *HW), dtype=np.float32)
    rgb_b = rng.standard_normal((2, 3, *HW), dtype=np.float32)
    d_a = rng.standard_normal((2, 1, *HW), dtype=np.float32)
    d_b = rng.standard_normal((2, 1, *HW), dtype=np.float32)
    return rgb_a, rgb_b, d_a, d_b


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _build_jax(ref_model):
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    dummy = jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.key(0), *dummy, train=False)
    imported = state_dict_to_variables(ref_model.state_dict())
    missing = unmatched_paths(variables, imported)
    assert not missing, f"import produced paths absent from the flax model: {missing[:10]}"
    variables = {
        "params": merge_variables(variables["params"], imported["params"]),
        "batch_stats": merge_variables(variables["batch_stats"], imported["batch_stats"]),
    }
    return model, jax.tree.map(jnp.asarray, variables)


def test_eval_forward_parity(ref_model, inputs):
    rgb_a, rgb_b, d_a, d_b = inputs
    ref_model.eval()
    with torch.no_grad():
        t1, t2, tl = ref_model(*(torch.from_numpy(v) for v in inputs))

    model, variables = _build_jax(ref_model)
    x1, x2, labels = model.apply(variables, _nhwc(rgb_a), _nhwc(rgb_b), _nhwc(d_a), _nhwc(d_b), train=False)

    np.testing.assert_allclose(np.asarray(x1)[..., 0], t1.numpy()[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2)[..., 0], t2.numpy()[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(labels)[..., 0], tl.numpy()[:, 0], rtol=1e-4, atol=1e-4)


def test_train_forward_parity(ref_model, inputs):
    """Train mode: BN uses batch stats; running stats update (twice, compounding)."""
    rgb_a, rgb_b, d_a, d_b = inputs
    # Import weights BEFORE the torch train-mode forward mutates running stats.
    model, variables = _build_jax(ref_model)
    ref_model.train()
    with torch.no_grad():
        t1, t2, _ = ref_model(*(torch.from_numpy(v) for v in inputs))
    # Grab an updated running stat for comparison.
    ref_stats = {k: v.clone() for k, v in ref_model.state_dict().items() if "running_" in k}

    (x1, x2, _), mutated = model.apply(
        variables, _nhwc(rgb_a), _nhwc(rgb_b), _nhwc(d_a), _nhwc(d_b), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(x1)[..., 0], t1.numpy()[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2)[..., 0], t2.numpy()[:, 0], rtol=1e-4, atol=1e-4)

    # Spot-check compounded running-stat updates on the siamese encoder stem
    # (called twice per forward: frames a then b).
    got = np.asarray(mutated["batch_stats"]["encoder"]["backbone"]["bn1"]["mean"])
    want = ref_stats["encoder.backbone.bn1.running_mean"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    got_v = np.asarray(mutated["batch_stats"]["encoder"]["backbone"]["bn1"]["var"])
    want_v = ref_stats["encoder.backbone.bn1.running_var"].numpy()
    np.testing.assert_allclose(got_v, want_v, rtol=1e-4, atol=1e-6)
    # Depth branch too (stop-gradiented tail still updates stats).
    got_d = np.asarray(mutated["batch_stats"]["depth_bn"]["mean"])
    want_d = ref_stats["depth_bn.running_mean"].numpy()
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-6)


def test_bf16_inference_mask_parity(ref_model, inputs):
    """The bfloat16 inference mode (test.py --dtype bfloat16, bench headline)
    must agree with f32 at the scale evaluation happens: masks are compared
    as uint8 (mask*255, reference evaluation.py:9-19), so bf16's reduced
    activation precision must not move the uint8 mask materially."""
    rgb_a, rgb_b, d_a, d_b = inputs
    model, variables = _build_jax(ref_model)
    bf16_model = model.clone(dtype=jnp.bfloat16)

    x1, x2, _ = model.apply(variables, _nhwc(rgb_a), _nhwc(rgb_b), _nhwc(d_a), _nhwc(d_b), train=False)
    y1, y2, _ = bf16_model.apply(variables, _nhwc(rgb_a), _nhwc(rgb_b), _nhwc(d_a), _nhwc(d_b), train=False)

    for f32_out, bf16_out in ((x1, y1), (x2, y2)):
        a = (np.asarray(f32_out) * 255).astype(np.int32)
        b = (np.asarray(bf16_out, dtype=np.float32) * 255).astype(np.int32)
        # fresh-init masks hover near sigmoid(0): demand near-total agreement
        # at uint8 scale and a tiny mean deviation.
        close = np.mean(np.abs(a - b) <= 3)
        assert close > 0.99, f"uint8 mask agreement {close:.4f}"
        assert np.mean(np.abs(a - b)) < 1.0
