"""Device-side metric scoring (test.py --device-metrics).

The bitwise soft-IoU (reference ``evaluation.py:3-21``) and the F-measure
both reduce to six integer counters over the (uint8 mask, binary GT) pair;
integers are bit-exact on any device, so computing the counters inside the
jit (`eval/metrics.py::metric_counters`) and rebuilding the float64 scores
on host (`scores_from_counters`) must reproduce host scoring EXACTLY — the
same doubles, hence the same log lines — while only 24 bytes/frame cross
the wire instead of the 0.4 MB mask.
"""
import os

import numpy as np
import pytest

from cosnet_tpu.config import TestDatasetConfig as DatasetCfg
from cosnet_tpu.utils.logging import RunLogger

from tests.test_runner_session import _build_tree, tiny_model, monkeypatch_module  # noqa: F401


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("devmetrics_tree"))
    _build_tree(root)
    return root


def test_counters_reproduce_host_metrics_bitwise():
    """Every branch of compute_iou/f_measure from counters, double-for-double:
    soft masks, the empty-GT quirk (predicted-background fraction), empty
    predictions, the >=128 F threshold, and a width that is not a multiple
    of 8 (exercises the packed-bit unpack slice)."""
    import jax.numpy as jnp

    from cosnet_tpu.eval.metrics import (
        compute_iou, f_measure, metric_counters, pack_gt_bits,
        scores_from_counters,
    )

    rng = np.random.default_rng(0)
    H, W = 23, 37  # W % 8 != 0
    soft = rng.integers(0, 256, (H, W), dtype=np.uint8)
    gt = (rng.random((H, W)) < 0.3).astype(np.uint8)
    zeros = np.zeros((H, W), np.uint8)
    cases = [
        (soft, gt),
        (soft, zeros),                       # empty GT, nonzero pred
        (zeros, zeros),                      # empty GT, empty pred -> iou=1, f=1
        (zeros, gt),                         # empty pred
        (np.full((H, W), 255, np.uint8), gt),
        (np.where(gt, 127, 128).astype(np.uint8), gt),  # threshold boundary
    ]
    preds = np.stack([c[0] for c in cases])[..., None]
    gt_bits = np.stack([pack_gt_bits(c[1]) for c in cases])
    counters = np.asarray(metric_counters(jnp.asarray(preds), jnp.asarray(gt_bits)))
    assert counters.dtype == np.int32
    for k, (pred, g) in enumerate(cases):
        iou, fm = scores_from_counters(counters[k], (H, W))
        assert iou == compute_iou(pred, g), f"case {k}"
        assert fm == f_measure(pred, g), f"case {k}"


def _run(tree, tmpdir, tag, *, device_metrics, raw_eval=True, pool_mb=0,
         data_parallel=False, batch_size=5):
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                        image_HW_4_model=(32, 48), output_WH=(48, 32),
                        subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum",
                          data_parallel=data_parallel)
    db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=batch_size,
                            raw_eval=raw_eval, keep_remainder=True)
    log_path = os.path.join(tmpdir, f"log_{tag}.txt")
    logger = RunLogger(log_path)
    res = session.run(db, ds_cfg, logger, batch_size=batch_size, shuffle=False,
                      frame_pool_mb=pool_mb, print_progress=False,
                      device_metrics=device_metrics)
    logger.close()
    lines = [l for l in open(log_path) if " IOU: " in l or "F-measure" in l]
    return res, lines


def test_device_metrics_matches_host_scoring(tree, tiny_model, tmp_path):
    """Raw (device-preprocess) path: per-frame IoU AND F-measure log lines
    bit-equal between host scoring and device counters."""
    host, host_lines = _run(tree, str(tmp_path), "host", device_metrics=False)
    dev, dev_lines = _run(tree, str(tmp_path), "dev", device_metrics=True)
    assert dev["frames"] == host["frames"] == 16
    assert dev_lines == host_lines
    assert dev["iou"] == host["iou"]
    assert dev["f_measure"] == host["f_measure"]


def test_device_metrics_float_path(tree, tiny_model, tmp_path):
    """Host-preprocessed (non-raw) eval with device counters — the mode a
    non-sbmrgbd dataset would use."""
    host, host_lines = _run(tree, str(tmp_path), "fhost", device_metrics=False,
                            raw_eval=False)
    dev, dev_lines = _run(tree, str(tmp_path), "fdev", device_metrics=True,
                          raw_eval=False)
    assert dev_lines == host_lines
    assert dev["iou"] == host["iou"]


def test_device_metrics_pooled_dp(tree, tiny_model, tmp_path):
    """Composed with --frame-pool and --data-parallel: the counters chain on
    the sharded mask, gt bits ride the same batch sharding, and the scores
    still match host scoring bit-exactly."""
    host, host_lines = _run(tree, str(tmp_path), "dphost", device_metrics=False,
                            data_parallel=True, pool_mb=64)
    dev, dev_lines = _run(tree, str(tmp_path), "dpdev", device_metrics=True,
                          data_parallel=True, pool_mb=64)
    assert dev_lines == host_lines
    assert dev["iou"] == host["iou"]
    assert dev["f_measure"] == host["f_measure"]
    assert dev["pool"]["uploads"] == 16  # gt bits don't disturb the pool


def test_device_metrics_rejects_mask_consumers(tree, tiny_model, tmp_path):
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                        image_HW_4_model=(32, 48), output_WH=(48, 32),
                        subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum")
    db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=4, raw_eval=True)
    logger = RunLogger(os.path.join(str(tmp_path), "log_err.txt"))
    with pytest.raises(SystemExit, match="device-metrics"):
        session.run(db, ds_cfg, logger, batch_size=4, device_metrics=True,
                    output_img_dir=str(tmp_path), print_progress=False)
    logger.close()
