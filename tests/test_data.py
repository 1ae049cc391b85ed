"""Data layer: synthetic SBM-RGBD tree, golden parity vs the reference loader."""
import os
import sys

import cv2
import numpy as np
import pytest

from cosnet_tpu.data import BatchLoader, SbmRgbdDataset
from cosnet_tpu.data.roi import crop_to_roi, find_roi


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sbm"))
    rng = np.random.default_rng(0)
    H, W = 480, 640
    for seq in ["Bootstrapping/seqA", "Shadows/seqB"]:
        for sub in ["input", "depth", "groundtruth"]:
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        roi = np.zeros((H, W), np.uint8)
        roi[40:440, 60:580] = 255
        cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
        for i in ["000001", "000002", "000003"]:
            cv2.imwrite(os.path.join(root, seq, "input", f"in{i}.png"), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(root, seq, "depth", f"d{i}.png"), rng.integers(0, 255, (H, W), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[100:300, 200:400] = 255
            cv2.imwrite(os.path.join(root, seq, "groundtruth", f"gt{i}.png"), gt)
    return root


def _reference_loader(root, subset):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from dataloaders import sbm_rgbd_loader as refdb

    return refdb.sbm_rgbd(
        root, sample_range=1, output_HW=(240, 320), for_training=False,
        batch_size=1, subset=subset, logFunc=lambda m: None,
    )


def test_eval_sample_bitwise_parity(tree):
    subset = {"Bootstrapping/seqA": ["000002"], "Shadows/seqB": ["000003"]}
    ref = _reference_loader(tree, subset)
    mine = SbmRgbdDataset(tree, sample_range=1, output_HW=(240, 320), for_training=False, batch_size=1, subset=subset)
    assert len(mine) == len(ref)
    rs, ms = ref[0], mine[0]
    assert (ms["seq_name"], ms["frame_index"]) == (rs["seq_name"], rs["frame_index"])
    assert np.array_equal(ms["target"], rs["target"].numpy().transpose(1, 2, 0))
    assert np.array_equal(ms["target_depth"], rs["target_depth"].numpy().transpose(1, 2, 0))
    assert np.array_equal(ms["target_gt"], rs["target_gt"].numpy())
    assert np.array_equal(ms["search_0"], rs["search_0"].numpy().transpose(1, 2, 0))


def test_find_roi_matches_reference(tree):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from dataloaders import sbm_rgbd_loader as refdb

    roi_img = cv2.imread(os.path.join(tree, "Bootstrapping/seqA", "ROI.bmp"), cv2.IMREAD_GRAYSCALE)
    assert tuple(map(tuple, refdb.find_roi(roi_img))) == find_roi(roi_img)
    # crop semantics: inclusive boundary
    cropped = crop_to_roi(roi_img, find_roi(roi_img))
    assert cropped.shape == (402, 522)  # (39..440, 59..580) inclusive


def test_train_batches_are_static_shape(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(240, 320), for_training=True, batch_size=2, seed=5)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    shapes = {b["target"].shape + (b["target_gt"].shape[1:]) for b in loader}
    assert shapes == {(2, 240, 320, 3, 240, 320)}


def test_subset_split_order(tree):
    subset = {"Bootstrapping/seqA": ["000002", "000001"], "Shadows/seqB": ["000003"]}
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(240, 320), for_training=False, batch_size=1, subset=subset)
    assert [(f.seq_name, f.frame_id) for f in ds.index.frames] == [
        ("Bootstrapping/seqA", "000002"),
        ("Bootstrapping/seqA", "000001"),
        ("Shadows/seqB", "000003"),
    ]


def test_len_truncates_to_batch_multiple(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(240, 320), for_training=False, batch_size=4, subset_percentage=1.0)
    assert len(ds.index) == 6 and len(ds) == 4  # reference quirk preserved


def test_validation_heuristics(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(240, 320), for_training=False, batch_size=1, subset_percentage=1.0)
    result = ds.validate_frame(ds.index.frames[0], channels="dt")
    assert result["gt"][0] is None  # ~17% foreground: healthy
    assert result["depth"][0] is None  # random depth: not mostly-zero


def test_device_prefetch_preserves_order_and_stages():
    from cosnet_tpu.data.pipeline import device_prefetch

    batches = [{"x": np.full((2, 2), i, np.float32), "name": [f"b{i}"]} for i in range(7)]

    # default put: device_put ndarrays, pass lists through
    out = list(device_prefetch(iter(batches), size=2))
    assert [o["name"][0] for o in out] == [f"b{i}" for i in range(7)]
    assert all(float(out[i]["x"][0, 0]) == i for i in range(7))

    # custom put: arbitrary staging object
    staged = list(device_prefetch(iter(batches), size=3, put=lambda b: (b["name"][0], b["x"].sum())))
    assert [s[0] for s in staged] == [f"b{i}" for i in range(7)]
    assert staged[3][1] == 12.0
