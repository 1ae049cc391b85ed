"""Native (C++/OpenMP) data-path kernels vs the cv2/numpy reference path."""
import os

import cv2
import numpy as np
import pytest

from cosnet_tpu.data import native
from cosnet_tpu.data.sbm_rgbd import SbmRgbdDataset

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_fused_bilinear_matches_reference_order():
    """crop→resize→−mean (fused) == −mean→crop→resize (reference order)."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    mean = np.array([104.00699, 116.66877, 122.67892], dtype=np.float32)
    roi = ((59, 580), (39, 440))
    want = cv2.resize((src.astype(np.float32) - mean)[39:441, 59:581], (320, 240))
    got = native.fused_crop_resize_meansub(src, roi, (240, 320), mean)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_nearest_bit_exact():
    rng = np.random.default_rng(1)
    gt = (rng.uniform(0, 1, (480, 640)) < 0.3).astype(np.uint8) * 255
    roi = ((59, 580), (39, 440))
    want = cv2.resize((gt[39:441, 59:581] != 0).astype(np.uint8), (320, 240), interpolation=cv2.INTER_NEAREST)
    got = native.fused_crop_resize_nearest(gt, roi, (240, 320), binarize=True)
    np.testing.assert_array_equal(got, want)


def test_loader_native_path_matches_numpy_path(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(2)
    seq = "Bootstrapping/seqA"
    for sub in ["input", "depth", "groundtruth"]:
        os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
    roi = np.zeros((480, 640), np.uint8)
    roi[40:440, 60:580] = 255
    cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
    cv2.imwrite(os.path.join(root, seq, "input", "in000001.png"), rng.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    cv2.imwrite(os.path.join(root, seq, "depth", "d000001.png"), rng.integers(0, 255, (480, 640), dtype=np.uint8))
    gt = np.zeros((480, 640), np.uint8)
    gt[100:300, 200:400] = 255
    cv2.imwrite(os.path.join(root, seq, "groundtruth", "gt000001.png"), gt)

    kw = dict(sample_range=0, output_HW=(240, 320), for_training=False, batch_size=1, subset_percentage=1.0)
    ref = SbmRgbdDataset(root, use_native=False, **kw)
    fast = SbmRgbdDataset(root, use_native=True, **kw)
    a, b = ref[0], fast[0]
    np.testing.assert_allclose(a["target"], b["target"], atol=1e-4)
    np.testing.assert_allclose(a["target_depth"], b["target_depth"], atol=1e-4)
    np.testing.assert_array_equal(a["target_gt"], b["target_gt"])
