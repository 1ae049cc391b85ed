"""Synchronized train-time augmentation: crop → scale → flip.

Behavioral parity with ``dataloaders/utils.py`` + the sharing protocol of
``sbm_rgbd_loader.py:700-722`` (SURVEY.md §2 "Aug utils"):

* the crop *offset* is shared across rgb/depth/gt of one frame;
* the flip probability is drawn once per sequence (all frames of a sequence
  flip together);
* crop/scale *ratios* are re-drawn once per batch via ``next_batch()``
  (crop ∈ U(0.8, 1), scale ∈ U(0.7, 1.3)).

Deviation (documented; SURVEY.md §7 hard part f): the reference feeds the
network variable post-scale image sizes, which would force an XLA recompile
per unique size. With ``static_shapes=True`` (default) the augmented frame
is resized back to the fixed output size — the crop keeps its zoom effect
and the scale ratio controls resampling zoom, while every train step
compiles exactly once.
"""
from typing import Optional, Tuple

import cv2
import numpy as np


def flip_lr(img: np.ndarray, flip_p: float) -> np.ndarray:
    """Flip horizontally when flip_p > 0.5 (reference utils.py:5-9)."""
    if flip_p > 0.5:
        return img[:, ::-1, ...] if img.ndim >= 2 else img
    return img


def scale(img: np.ndarray, ratio: float, nearest: bool = False) -> np.ndarray:
    """cv2 resize by ratio (reference utils.py:18-23); HW or HWC layout."""
    new_h = int(img.shape[0] * ratio)
    new_w = int(img.shape[1] * ratio)
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (new_w, new_h), interpolation=interp)


def crop(img: np.ndarray, size_scale: float, offset: Optional[Tuple[int, int]], rng) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Random crop to size_scale·shape with shared offset (utils.py:32-46)."""
    h = int(size_scale * img.shape[0])
    w = int(size_scale * img.shape[1])
    if offset is None:
        y = rng.choice(range(img.shape[0] - h)) if img.shape[0] > h else 0
        x = rng.choice(range(img.shape[1] - w)) if img.shape[1] > w else 0
        offset = (y, x)
    y, x = offset
    return img[y : y + h, x : x + w, ...], offset


def augment_frame(
    img: np.ndarray,
    crop_ratio: float,
    scale_ratio: float,
    flip_p: float,
    offset: Optional[Tuple[int, int]],
    rng,
    nearest: bool = False,
    static_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """crop → scale → flip (reference order, sbm_rgbd_loader.py:713-720);
    optionally resize back to ``static_hw`` for XLA-static shapes."""
    img, offset = crop(img, crop_ratio, offset, rng)
    img = scale(img, scale_ratio, nearest=nearest)
    img = flip_lr(img, flip_p)
    if static_hw is not None and img.shape[:2] != tuple(static_hw):
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        img = cv2.resize(img, (static_hw[1], static_hw[0]), interpolation=interp)
    return np.ascontiguousarray(img), offset
