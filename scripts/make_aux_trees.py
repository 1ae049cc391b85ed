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
    import cv2

    marker = os.path.join(root, ".done")
    if os.path.exists(marker):
        return root
    rng = np.random.default_rng(12)
    H, W = 480, 854
    seqs = ["blackswan", "camel"]
    for seq in seqs:
        os.makedirs(os.path.join(root, "JPEGImages", "480p", seq), exist_ok=True)
        os.makedirs(os.path.join(root, "Annotations", "480p", seq), exist_ok=True)
        for i in range(frames_per_seq):
            cv2.imwrite(os.path.join(root, "JPEGImages", "480p", seq, f"{i:05d}.jpg"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[150:330, 250:600] = 255
            cv2.imwrite(os.path.join(root, "Annotations", "480p", seq, f"{i:05d}.png"), gt)
    with open(os.path.join(root, "val_seqs.txt"), "w") as f:
        f.write("".join(s + "\n" for s in seqs))
    open(marker, "w").close()
    return root


if __name__ == "__main__":
    print(build_hzfu("/tmp/cosnet_hzfu_tree"))
    print(build_davis("/tmp/cosnet_davis_tree"))
