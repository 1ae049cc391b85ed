"""Device-preprocess eval pipeline (uint8 on the wire): cv2-exact resize
matrices, raw dataset samples, and end-to-end mask parity vs the host path.

The host chain is ``resize_linear(crop(u8 − mean))`` (sbm loader order,
reference ``sbm_rgbd_loader.py:604-626``); the device chain is
``resize(crop(u8)) − mean`` — bilinear rows sum to exactly 1, so the two
differ only by float rounding."""
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosnet_tpu.data import SbmRgbdDataset
from cosnet_tpu.data.device_preprocess import preprocess_frames


MEAN = (104.00699, 116.66877, 122.67892)


def test_resize_matches_cv2_linear_float_path():
    rng = np.random.default_rng(0)
    out_hw = (120, 164)
    hull = (200, 260)
    crops = [(200, 260), (173, 215), (64, 250), (200, 97)]
    rgbs, depths, hws = [], [], []
    host_rgb, host_depth = [], []
    for h, w in crops:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.integers(0, 256, (h, w), dtype=np.uint8)
        # host chain: (f32 − mean) then resize (mean-sub commutes)
        host_rgb.append(cv2.resize(rgb.astype(np.float32) - np.float32(MEAN),
                                   (out_hw[1], out_hw[0])))
        host_depth.append(cv2.resize(depth.astype(np.float32), (out_hw[1], out_hw[0])))
        rp = np.zeros((*hull, 3), np.uint8)
        rp[:h, :w] = rgb
        dp = np.zeros(hull, np.uint8)
        dp[:h, :w] = depth
        rgbs.append(rp), depths.append(dp), hws.append([h, w])

    d_rgb, d_depth = preprocess_frames(
        jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(depths)),
        jnp.asarray(hws, jnp.int32), out_hw, MEAN)
    # atol 1e-2 on a 0..255 scale (≈4e-5 relative): the device computes tap
    # positions in f32 where cv2 uses f64 — boundary-tap flips move ≤1e-2 of
    # weight; the model-level gate below is ≤1 uint8 level.
    np.testing.assert_allclose(np.asarray(d_rgb), np.stack(host_rgb), atol=1e-2)
    np.testing.assert_allclose(np.asarray(d_depth)[..., 0], np.stack(host_depth), atol=1e-2)


def test_resize_matrix_rows_sum_to_one():
    from cosnet_tpu.data.device_preprocess import _resize_matrix

    m = np.asarray(_resize_matrix(300, 120, jnp.float32(241.0)))
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    assert not m[:, 241:].any()  # padding never sampled


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sbm_raw"))
    rng = np.random.default_rng(4)
    H, W = 200, 300
    for seq, roi_box in [("Bootstrapping/seqA", (10, 190, 20, 280)),
                         ("Shadows/seqB", None)]:  # seqB: no ROI.bmp (probe path)
        for sub in ["input", "depth", "groundtruth"]:
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        if roi_box is not None:
            y0, y1, x0, x1 = roi_box
            roi = np.zeros((H, W), np.uint8)
            roi[y0:y1, x0:x1] = 255
            cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
        for i in ["000001", "000002", "000003"]:
            cv2.imwrite(os.path.join(root, seq, "input", f"in{i}.png"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(root, seq, "depth", f"d{i}.png"),
                        rng.integers(0, 255, (H, W), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[60:140, 90:210] = 255
            cv2.imwrite(os.path.join(root, seq, "groundtruth", f"gt{i}.png"), gt)
    return root


def test_raw_samples_shapes_and_content(tree):
    ds = SbmRgbdDataset(tree, sample_range=1, output_HW=(96, 128), for_training=False,
                        batch_size=1, subset_percentage=1.0, raw_eval=True, seed=1)
    hull = ds.raw_hull()
    assert hull == (200, 300)  # seqB has no interior ROI zeros -> full frame
    s = ds[0]
    assert s["target"].dtype == np.uint8 and s["target"].shape == (*hull, 3)
    assert s["target_depth"].shape == hull
    h, w = s["target_hw"]
    assert (h, w) != hull  # seqA's ROI crop is smaller
    assert not s["target"][h:].any() and not s["target"][:, w:].any()  # zero pad
    assert s["target_gt"].shape == (96, 128)  # host-scored gt at model res
    assert s["search_0_hw"].dtype == np.int32


def test_raw_mode_mask_parity_vs_host_path(tree):
    """End-to-end: tiny model, raw device-preprocess forward vs host-
    preprocessed forward — uint8 masks agree to <=1 gray level."""
    from cosnet_tpu.eval.infer import (
        build_multi_reference_forward, build_multi_reference_forward_raw,
    )
    from cosnet_tpu.nn.raa import RGBDSegmentationRAA
    from cosnet_tpu.nn.resnet import Bottleneck

    out_hw = (64, 96)
    host_ds = SbmRgbdDataset(tree, sample_range=1, output_HW=out_hw, for_training=False,
                             batch_size=1, subset_percentage=1.0, seed=9)
    raw_ds = SbmRgbdDataset(tree, sample_range=1, output_HW=out_hw, for_training=False,
                            batch_size=1, subset_percentage=1.0, raw_eval=True, seed=9)
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                                num_blocks_depth=[1, 1, 1, 1])
    z3 = np.zeros((1, *out_hw, 3), np.float32)
    z1 = np.zeros((1, *out_hw, 1), np.float32)
    variables = model.init(jax.random.key(0), z3, z3, z1, z1, train=False)
    fwd = build_multi_reference_forward(model, 4, as_uint8=True)
    fwd_raw = build_multi_reference_forward_raw(model, 4, out_hw, MEAN, as_uint8=True)

    for i in range(len(host_ds)):
        hs, rs = host_ds[i], raw_ds[i]
        assert hs["frame_index"] == rs["frame_index"]
        m_host = np.asarray(fwd(
            variables, hs["target"][None], hs["search_0"][None, None],
            hs["target_depth"][None], hs["search_0_depth"][None, None]))
        m_raw = np.asarray(fwd_raw(
            variables, rs["target"][None], rs["search_0"][None, None],
            rs["target_depth"][None], rs["search_0_depth"][None, None],
            rs["target_hw"][None], rs["search_0_hw"][None, None]))
        diff = np.abs(m_host.astype(np.int16) - m_raw.astype(np.int16))
        assert diff.max() <= 1, (i, diff.max())
        assert np.array_equal(hs["target_gt"], rs["target_gt"])
