"""Debug image dumps — re-render what the network sees.

Shared by the dataset loaders (reference sbm_rgbd_loader.py:671-694,
hzfu_rgbd_loader.py:407-429). Values are clipped before the uint8 cast —
the reference's own dumps wrap around for bright pixels
(np.uint8(rgb + mean) overflows), producing garbage debug PNGs.
"""
import os

import numpy as np


def dump_frame_images(out_dir, seq_name, stem_rgb, stem_depth, stem_gt,
                      rgb, depth, gt, channels, meanval):
    from PIL import Image

    save_dir = os.path.join(out_dir, seq_name)
    os.makedirs(save_dir, exist_ok=True)
    if "rgb" in channels or "d" in channels:
        Image.fromarray(np.uint8(np.clip(rgb + meanval, 0, 255)), "RGB").save(
            os.path.join(save_dir, f"{stem_rgb}.png"))
    if "d" in channels:
        Image.fromarray(np.uint8(np.clip(depth[:, :, 0], 0, 255)), "L").save(
            os.path.join(save_dir, f"{stem_depth}.png"))
    if "t" in channels:
        Image.fromarray(np.uint8(gt * 255), "L").save(
            os.path.join(save_dir, f"{stem_gt}.png"))
