"""Deterministic data pipeline: seeded datasets are reproducible regardless
of worker-thread scheduling (per-sample RNG derived from (seed, epoch, idx))."""
import os

import cv2
import numpy as np
import pytest

from cosnet_tpu.data import BatchLoader, SbmRgbdDataset


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("det"))
    rng = np.random.default_rng(0)
    H, W = 120, 160
    for seq in ["Bootstrapping/seqA", "Shadows/seqB"]:
        for sub in ["input", "depth", "groundtruth"]:
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        roi = np.zeros((H, W), np.uint8)
        roi[10:110, 15:145] = 255
        cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
        for i in [f"{k:06d}" for k in range(1, 7)]:
            cv2.imwrite(os.path.join(root, seq, "input", f"in{i}.png"), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(root, seq, "depth", f"d{i}.png"), rng.integers(0, 255, (H, W), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[30:90, 40:120] = 255
            cv2.imwrite(os.path.join(root, seq, "groundtruth", f"gt{i}.png"), gt)
    return root


def _epoch(tree, seed, workers):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(64, 80), for_training=True,
                        batch_size=4, subset_percentage=1.0, seed=seed)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=seed, num_workers=workers)
    return [ {k: (v.copy() if isinstance(v, np.ndarray) else list(v)) for k, v in b.items()} for b in loader ]


def test_seeded_pipeline_reproducible_across_worker_counts(tree):
    a = _epoch(tree, seed=11, workers=1)
    b = _epoch(tree, seed=11, workers=4)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        assert ba["seq_name"] == bb["seq_name"]
        np.testing.assert_array_equal(ba["target"], bb["target"])
        np.testing.assert_array_equal(ba["search_0"], bb["search_0"])
        np.testing.assert_array_equal(ba["target_gt"], bb["target_gt"])


def test_same_index_same_sample(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(64, 80), for_training=True,
                        batch_size=4, subset_percentage=1.0, seed=3)
    s1, s2 = ds[2], ds[2]
    np.testing.assert_array_equal(s1["target"], s2["target"])
    np.testing.assert_array_equal(s1["search_0"], s2["search_0"])


def test_epoch_changes_samples(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(64, 80), for_training=True,
                        batch_size=4, subset_percentage=1.0, seed=3)
    s1 = ds[2]
    ds.new_training_epoch()
    s2 = ds[2]
    # augmentation offsets/flips redraw per epoch
    assert not np.array_equal(s1["target"], s2["target"])
