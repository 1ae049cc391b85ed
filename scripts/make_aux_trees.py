#!/usr/bin/env python
"""Synthetic HZFU-RGBD and DAVIS trees for end-to-end driver evidence.

Real data for neither dataset exists in this environment; these builders
lay out the exact directory/naming contracts the loaders (and the
reference's) expect so ``serve.py``/``test.py`` can be driven end-to-end:

* HZFU-RGBD (reference ``dataloaders/hzfu_rgbd_loader.py:254-287,486-507``):
  ``RGB_data/<seq>/<id>.png``, ``Depth_data/<seq>/<id>.mat`` (MATLAB-style
  transposed float array under the ``depth`` key), ``Label/<seq>/
  <id>_obj_<k>.png`` — the first-object rule scores ``_obj_1`` only. The
  sequences/frame ids mirror ``config.yaml``'s hzfu test subset
  (child_no1, dog_no_1, toy_wg_occ, tracking4, zcup_move_1).
* DAVIS (reference ``test.py:241`` geometry): ``JPEGImages/480p/<seq>/
  %05d.jpg`` + ``Annotations/480p/<seq>/%05d.png`` + a val subset file.

Deterministic (seeded) so fingerprints are reproducible across drives.
"""
import os

import numpy as np

HZFU_SUBSET = {
    "child_no1": 9, "dog_no_1": 4, "toy_wg_occ": 11, "tracking4": 8,
    "zcup_move_1": 7,
}  # sequence -> number of subset frames (ids 01, 06, 11, ... step 5)


def build_hzfu(root: str) -> str:
    import cv2
    import h5py

    marker = os.path.join(root, ".done")
    if os.path.exists(marker):
        return root
    rng = np.random.default_rng(11)
    H, W = 480, 640
    for seq, n in HZFU_SUBSET.items():
        for sub in ("RGB_data", "Depth_data", "Label"):
            os.makedirs(os.path.join(root, sub, seq), exist_ok=True)
        for i in range(n):
            fid = f"{1 + 5 * i:02d}"
            cv2.imwrite(os.path.join(root, "RGB_data", seq, f"{fid}.png"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            depth = rng.uniform(500.0, 3000.0, (H, W)).astype(np.float32)
            with h5py.File(os.path.join(root, "Depth_data", seq, f"{fid}.mat"), "w") as f:
                f["depth"] = depth.T  # stored transposed, loader transposes back
            gt = np.zeros((H, W), np.uint8)
            gt[150:330, 200:440] = 255
            cv2.imwrite(os.path.join(root, "Label", seq, f"{fid}_obj_1.png"), gt)
            # a second object mask the first-object rule must ignore
            cv2.imwrite(os.path.join(root, "Label", seq, f"{fid}_obj_2.png"), 255 - gt)
    open(marker, "w").close()
    return root


def build_davis(root: str, frames_per_seq: int = 12) -> str:
    """STRUCTURED synthetic DAVIS: a textured elliptical object translating
    over a static textured background, GT tracking the object.

    Round 4's noise-frame tree supported mechanism-only drives (VERDICT r4:
    fresh-init ori, F-measure 0.0) and left the CRF grid's verdict caveated
    — a bilateral kernel is meaningless on frames with no edge structure.
    These frames have (a) appearance/background separation a short training
    run can learn, (b) real object boundaries for the CRF's color kernel,
    (c) inter-frame motion so co-attention between target and reference
    frames carries signal. Deterministic (seeded) for reproducible drives.
    """
    import cv2

    marker = os.path.join(root, ".done_v2_structured")
    if os.path.exists(marker):
        return root
    rng = np.random.default_rng(12)
    H, W = 480, 854
    seqs = {"blackswan": ((30, 40, 190), 95, 65), "camel": ((40, 170, 180), 120, 80)}
    for seq, (color, ax0, ax1) in seqs.items():
        os.makedirs(os.path.join(root, "JPEGImages", "480p", seq), exist_ok=True)
        os.makedirs(os.path.join(root, "Annotations", "480p", seq), exist_ok=True)
        # static-camera background: smooth gradient + fixed blurred texture
        yy, xx = np.mgrid[0:H, 0:W]
        bg = np.stack([40 + 60 * yy / H, 90 + 50 * xx / W, 70 + 40 * yy / H],
                      axis=-1)
        tex = cv2.GaussianBlur(
            rng.normal(0, 22, (H, W, 3)).astype(np.float32), (0, 0), 3)
        bg = np.clip(bg + tex, 0, 255)
        obj_tex = cv2.GaussianBlur(
            rng.normal(0, 18, (H, W, 3)).astype(np.float32), (0, 0), 2)
        for i in range(frames_per_seq):
            t = i / max(frames_per_seq - 1, 1)
            cx = int(W * (0.25 + 0.5 * t))  # translate left -> right
            cy = int(H * (0.45 + 0.12 * np.sin(2 * np.pi * t)))
            gt = np.zeros((H, W), np.uint8)
            cv2.ellipse(gt, (cx, cy), (ax0, ax1), 20 * t, 0, 360, 255, -1)
            frame = bg.copy()
            m = gt > 0
            frame[m] = np.clip(np.asarray(color, np.float32) + obj_tex[m], 0, 255)
            frame += rng.normal(0, 4, frame.shape)  # per-frame sensor noise
            cv2.imwrite(os.path.join(root, "JPEGImages", "480p", seq, f"{i:05d}.jpg"),
                        np.clip(frame, 0, 255).astype(np.uint8))
            cv2.imwrite(os.path.join(root, "Annotations", "480p", seq, f"{i:05d}.png"), gt)
    with open(os.path.join(root, "val_seqs.txt"), "w") as f:
        f.write("".join(s + "\n" for s in seqs))
    open(marker, "w").close()
    return root


if __name__ == "__main__":
    print(build_hzfu("/tmp/cosnet_hzfu_tree"))
    print(build_davis("/tmp/cosnet_davis_tree"))
