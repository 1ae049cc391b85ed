"""Metrics parity vs reference evaluation.py + multi-reference inference."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosnet_tpu.eval.infer import build_multi_reference_forward
from cosnet_tpu.eval.metrics import compute_iou, f_measure
from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck


def _reference_iou():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from evaluation import compute_iou as ref_iou

    return ref_iou


@pytest.mark.parametrize("case", ["normal", "empty_gt", "full_gt", "graded"])
def test_compute_iou_matches_reference(case):
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    if case == "normal":
        gt = (rng.uniform(0, 1, (24, 32)) < 0.3).astype(np.uint8)
    elif case == "empty_gt":
        gt = np.zeros((24, 32), np.uint8)
    elif case == "full_gt":
        gt = np.ones((24, 32), np.uint8)
    else:
        gt = (pred > 100).astype(np.uint8)
    ref = _reference_iou()
    np.testing.assert_allclose(compute_iou(pred, gt), ref(pred, gt), rtol=1e-12)


def test_f_measure_edges():
    gt = np.zeros((4, 4), np.uint8)
    assert f_measure(np.zeros((4, 4), np.uint8), gt) == 1.0
    assert f_measure(np.full((4, 4), 255, np.uint8), gt) == 0.0
    gt[1:3, 1:3] = 1
    pred = np.where(gt, 255, 0).astype(np.uint8)
    np.testing.assert_allclose(f_measure(pred, gt), 1.0)


def test_bf16_input_staging_bit_identical():
    """Host-side bf16 cast of the eval inputs (runner.py stage_dtype — halves
    the transfer-bound H2D bytes) must be bit-identical to feeding f32: the
    bf16 model's first conv performs the same round-to-nearest-even cast on
    device anyway."""
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                                num_blocks_depth=[1, 1, 1, 1], dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    B, R, H, W = 2, 2, 32, 32
    target = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    searches = rng.standard_normal((B, R, H, W, 3)).astype(np.float32)
    t_depth = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    s_depths = rng.standard_normal((B, R, H, W, 1)).astype(np.float32)
    variables = model.init(jax.random.key(0), target, target, t_depth, t_depth, train=False)
    fwd = build_multi_reference_forward(model, n_inputs=4, as_uint8=True)

    f32_masks = np.asarray(fwd(variables, target, searches, t_depth, s_depths))
    staged = [x.astype(jnp.bfloat16) for x in (target, searches, t_depth, s_depths)]
    bf16_masks = np.asarray(fwd(variables, *staged))
    np.testing.assert_array_equal(f32_masks, bf16_masks)


def test_multi_reference_forward_matches_sequential_loop():
    """Batched N-ref ensemble == reference's sequential averaging (test.py:287-305)."""
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1], num_blocks_depth=[1, 1, 1, 1])
    rng = np.random.default_rng(1)
    B, R, H, W = 2, 3, 32, 32
    target = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))
    searches = jnp.asarray(rng.standard_normal((B, R, H, W, 3), dtype=np.float32))
    t_depth = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32))
    s_depths = jnp.asarray(rng.standard_normal((B, R, H, W, 1), dtype=np.float32))
    variables = model.init(jax.random.key(0), target, target, t_depth, t_depth, train=False)

    fwd = build_multi_reference_forward(model, n_inputs=4)
    batched = np.asarray(fwd(variables, target, searches, t_depth, s_depths))

    acc = np.zeros((B, H, W, 1), np.float32)
    for i in range(R):
        x1, _, _ = model.apply(variables, target, searches[:, i], t_depth, s_depths[:, i], train=False)
        acc += np.asarray(x1)
    sequential = acc / R
    np.testing.assert_allclose(batched, sequential, rtol=1e-5, atol=1e-5)
