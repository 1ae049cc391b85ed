"""Decoded-frame LRU cache: correctness (bit-identical samples), hit
behavior (no repeat decode on revisits — the eval protocol re-decodes each
frame up to sample_range+1 times, /root/reference/test.py:287-305), budget
eviction, and train-path equivalence under the cache."""
import os

import cv2
import numpy as np
import pytest

from cosnet_tpu.data import SbmRgbdDataset
from cosnet_tpu.data.frame_cache import FrameCache


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sbm_cache"))
    rng = np.random.default_rng(1)
    H, W = 240, 320
    seq = "Bootstrapping/seqA"
    for sub in ["input", "depth", "groundtruth"]:
        os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
    roi = np.zeros((H, W), np.uint8)
    roi[20:220, 30:290] = 255
    cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
    for i in ["000001", "000002", "000003", "000004"]:
        cv2.imwrite(os.path.join(root, seq, "input", f"in{i}.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cv2.imwrite(os.path.join(root, seq, "depth", f"d{i}.png"),
                    rng.integers(0, 255, (H, W), dtype=np.uint8))
        gt = np.zeros((H, W), np.uint8)
        gt[60:160, 100:220] = 255
        cv2.imwrite(os.path.join(root, seq, "groundtruth", f"gt{i}.png"), gt)
    return root


def _ds(tree, **kw):
    kw.setdefault("sample_range", 1)
    kw.setdefault("output_HW", (120, 160))
    kw.setdefault("for_training", False)
    kw.setdefault("batch_size", 1)
    kw.setdefault("subset_percentage", 1.0)
    return SbmRgbdDataset(tree, **kw)


def test_cached_samples_bit_identical(tree):
    on = _ds(tree, seed=3)
    off = _ds(tree, seed=3, decode_cache_mb=0)
    for i in range(len(on)):
        a, b = on[i], off[i]
        for k in ("target", "target_depth", "target_gt", "search_0", "search_0_depth"):
            assert np.array_equal(a[k], b[k]), (i, k)
    assert on._cache.hits > 0  # counterpart draws revisit decoded frames


def test_no_repeat_decode_on_revisit(tree, monkeypatch):
    ds = _ds(tree)
    calls = []
    real_imread = cv2.imread

    def counting_imread(path, *a, **kw):
        calls.append(path)
        return real_imread(path, *a, **kw)

    monkeypatch.setattr(cv2, "imread", counting_imread)
    for _ in range(3):  # a sweep revisiting every frame 3 times
        for i in range(len(ds)):
            ds[i]
    # 4 frames x (rgb + depth + gt) decoded exactly once each
    assert len(calls) == 12
    assert ds._cache.hits >= 2 * 4 * 3  # every later visit is a hit


def test_train_path_equivalent_under_cache(tree):
    # Same seed => same augmentation draws; decode is pre-augment, so the
    # cached dataset must produce bit-identical augmented samples.
    on = _ds(tree, for_training=True, seed=7)
    off = _ds(tree, for_training=True, seed=7, decode_cache_mb=0)
    on.next_batch(0), off.next_batch(0)
    for i in range(len(on)):
        a, b = on[i], off[i]
        for k in ("target", "target_depth", "target_gt", "search_0"):
            assert np.array_equal(a[k], b[k]), (i, k)
    # second epoch re-augments from the same cached decodes
    on.new_training_epoch(), off.new_training_epoch()
    on.next_batch(0), off.next_batch(0)
    a, b = on[0], off[0]
    assert np.array_equal(a["target"], b["target"])


def test_cached_arrays_are_frozen(tree):
    ds = _ds(tree)
    s = ds[0]
    ds[0]  # second visit returns the cached array itself
    with pytest.raises(ValueError):
        s["target"][0, 0, 0] = 1.0


def test_budget_eviction():
    cache = FrameCache(max_bytes=3000)
    a = cache.get_or_build(("a",), lambda: np.zeros(300, np.float32))  # 1200 B
    cache.get_or_build(("b",), lambda: np.zeros(300, np.float32))
    cache.get_or_build(("c",), lambda: np.zeros(300, np.float32))  # evicts a
    assert len(cache) == 2 and cache.nbytes == 2400
    rebuilt = cache.get_or_build(("a",), lambda: np.ones(300, np.float32))
    assert rebuilt[0] == 1.0  # was evicted, rebuilt
    assert not np.shares_memory(rebuilt, a)


def test_zero_budget_disables():
    cache = FrameCache(max_bytes=0)
    out = cache.get_or_build(("x",), lambda: np.zeros(4))
    assert len(cache) == 0 and out.flags.writeable
