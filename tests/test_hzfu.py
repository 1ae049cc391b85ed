"""HZFU-RGBD loader: synthetic tree with .mat depth, golden parity vs reference."""
import os
import sys

import cv2
import h5py
import numpy as np
import pytest

from cosnet_tpu.data import HzfuRgbdDataset


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hzfu"))
    rng = np.random.default_rng(0)
    H, W = 240, 320
    for seq in ["child_no1", "toy_wg_occ"]:
        for sub in ["RGB_data", "Depth_data", "Label"]:
            os.makedirs(os.path.join(root, sub, seq), exist_ok=True)
        for fid in ["01", "06", "11"]:
            cv2.imwrite(os.path.join(root, "RGB_data", seq, f"{fid}.png"), rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            depth = rng.uniform(500, 3000, (H, W)).astype(np.float32)
            with h5py.File(os.path.join(root, "Depth_data", seq, f"{fid}.mat"), "w") as f:
                f["depth"] = depth.T  # stored transposed, loader transposes back
            gt = np.zeros((H, W), np.uint8)
            gt[50:150, 100:200] = 255
            cv2.imwrite(os.path.join(root, "Label", seq, f"{fid}_obj_1.png"), gt)
            # second object for the same frame id — first-object rule must ignore it
            cv2.imwrite(os.path.join(root, "Label", seq, f"{fid}_obj_2.png"), 255 - gt)
    return root


def test_manifest_first_object_rule(tree):
    ds = HzfuRgbdDataset(tree, sample_range=1, output_HW=(120, 160), for_training=False, subset_percentage=1.0)
    assert len(ds.entire.sequences) == 2
    for seq in ds.entire.sequences:
        frames = ds.entire.frames_of(seq)
        assert [f.frame_id for f in frames] == ["01", "06", "11"]
        assert all(f.gt_name.endswith("_obj_1.png") for f in frames)


def test_sample_parity_vs_reference(tree):
    subset = {"child_no1": ["01_obj_1.png"], "toy_wg_occ": ["06_obj_1.png"]}
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from dataloaders import hzfu_rgbd_loader as refdb

    ref = refdb.HzFuRGBDVideos(tree, sample_range=1, output_HW=(120, 160), for_training=False,
                               batch_size=1, subset=subset)
    mine = HzfuRgbdDataset(tree, sample_range=1, output_HW=(120, 160), for_training=False,
                           batch_size=1, subset=subset)
    assert len(mine) == len(ref)
    rs, ms = ref[0], mine[0]
    assert (ms["seq_name"], ms["frame_index"]) == (rs["seq_name"], rs["frame_index"])
    np.testing.assert_allclose(ms["target"], rs["target"].numpy().transpose(1, 2, 0), atol=1e-4)
    np.testing.assert_allclose(ms["target_depth"], rs["target_depth"].numpy().transpose(1, 2, 0), atol=1e-4)
    np.testing.assert_array_equal(ms["target_gt"], rs["target_gt"].numpy())


def test_depth_as_rgb_channels(tree):
    """'hzfud' mode: depth replicated as rgb minus mean (reference :388-398)."""
    subset = {"child_no1": ["01_obj_1.png"]}
    ds = HzfuRgbdDataset(tree, sample_range=1, output_HW=(120, 160), for_training=False,
                         channels_for_target_frame="dt", channels_for_counterpart_frame="d", subset=subset)
    s = ds[0]
    assert s["target"].shape == (120, 160, 3)
    # each channel == depth - per-channel mean
    d = s["target_depth"][:, :, 0]
    for c, mean in enumerate(ds.meanval):
        np.testing.assert_allclose(s["target"][:, :, c], d - mean, atol=1e-4)
