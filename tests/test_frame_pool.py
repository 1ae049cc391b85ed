"""Device-resident frame pool (eval): pooled staging must match the plain
device-preprocess (raw) path bit-exactly while shipping each unique frame
over the wire only once.

The eval protocol revisits every frame ~sample_range extra times as a
counterpart (random picks over the sequence, reference test.py:287-305);
the pool (`eval/runner.py::_DeviceFramePool`) uploads each (seq, frame_id)
once and the batch stack is built inside the jit from device-resident
buffers. Driven by `test.py/serve.py --frame-pool MB`.
"""
import os

import numpy as np
import pytest

from cosnet_tpu.config import TestDatasetConfig as DatasetCfg
from cosnet_tpu.utils.logging import RunLogger

from tests.test_runner_session import _build_tree, tiny_model, monkeypatch_module  # noqa: F401


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pool_tree"))
    _build_tree(root)
    return root


def _run_raw(tree, tmpdir, tag, pool_mb, batch_size=5, data_parallel=False):
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                        image_HW_4_model=(32, 48), output_WH=(48, 32),
                        subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum",
                          data_parallel=data_parallel)
    # keep_remainder + batch 5 on 16 frames -> a short trailing batch, which
    # the pooled staging pads by repeating device buffer refs (free)
    db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=batch_size,
                            raw_eval=True, keep_remainder=True)
    log_path = os.path.join(tmpdir, f"log_{tag}.txt")
    logger = RunLogger(log_path)
    res = session.run(db, ds_cfg, logger, batch_size=batch_size, shuffle=False,
                      frame_pool_mb=pool_mb, print_progress=False)
    logger.close()
    lines = [l for l in open(log_path) if " IOU: " in l and " seq: " in l]
    return res, lines


def test_pooled_matches_raw_exactly(tree, tiny_model, tmp_path):
    raw, raw_lines = _run_raw(tree, str(tmp_path), "raw", pool_mb=0)
    pooled, pooled_lines = _run_raw(tree, str(tmp_path), "pooled", pool_mb=64)
    assert pooled["frames"] == raw["frames"] == 16
    # identical per-frame scores in uint8 mask space, not just aggregates
    assert pooled_lines == raw_lines
    assert pooled["iou"] == raw["iou"]
    assert pooled["f_measure"] == raw["f_measure"]
    # wire accounting: 16 unique frames uploaded once; the 16 counterpart
    # revisits (sample_range=1) all hit the pool
    stats = pooled["pool"]
    assert stats["uploads"] == 16
    assert stats["hits"] == 16
    assert raw.get("pool") is None


def test_pool_eviction_stays_correct(tree, tiny_model, tmp_path):
    """A budget far below the working set forces LRU eviction every batch;
    re-uploads cost wire bytes but results must not change."""
    raw, raw_lines = _run_raw(tree, str(tmp_path), "raw2", pool_mb=0)
    # one padded frame is 56x64x3 + 56x64 u8 ~ 0.014 MB; budget of ~2 frames
    tiny, tiny_lines = _run_raw(tree, str(tmp_path), "tinypool", pool_mb=0.03)
    assert tiny_lines == raw_lines
    assert tiny["pool"]["uploads"] > 16  # evictions forced re-uploads
    assert tiny["pool"]["resident_mb"] <= 0.04


def test_pooled_data_parallel_matches_raw(tree, tiny_model, tmp_path):
    """--frame-pool composed with --data-parallel: per-row frames resolve to
    pool buffers on their shard's device, per-device stacks assemble into the
    sharded global batch zero-copy (runner.py::stage_pooled_dp), and the
    already-compiled sharded raw executable consumes it. Each unique frame
    must still cross the host wire exactly once; cross-device revisits move
    device-to-device. Results must match the raw DP path bit-exactly."""
    raw, raw_lines = _run_raw(tree, str(tmp_path), "dp_raw", pool_mb=0,
                              data_parallel=True)
    pooled, pooled_lines = _run_raw(tree, str(tmp_path), "dp_pool", pool_mb=64,
                                    data_parallel=True)
    assert pooled["frames"] == raw["frames"] == 16
    assert pooled_lines == raw_lines
    assert pooled["iou"] == raw["iou"]
    assert pooled["f_measure"] == raw["f_measure"]
    stats = pooled["pool"]
    # host wire: each of the 16 unique frames uploads exactly once; every
    # other resolution (counterpart revisits + pad rows) is a device hit or
    # a d2d move. batch 5 on the 8-device mesh pads to 8 rows/batch:
    # 4 batches x 8 rows x 2 slots (target + 1 counterpart) = 64 lookups.
    assert stats["uploads"] == 16
    assert stats["hits"] + stats["d2d_moves"] == 64 - 16


def test_pool_requires_raw_mode(tree, tiny_model, tmp_path):
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                        image_HW_4_model=(32, 48), output_WH=(48, 32),
                        subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum")
    db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=4)  # host preprocess
    logger = RunLogger(os.path.join(str(tmp_path), "log_err.txt"))
    with pytest.raises(SystemExit, match="frame-pool"):
        session.run(db, ds_cfg, logger, batch_size=4, frame_pool_mb=64,
                    print_progress=False)
    logger.close()
