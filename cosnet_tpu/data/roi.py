"""ROI extraction from SBM-RGBD ``ROI.bmp`` masks.

Behavioral parity with the reference's center-out boundary scan
(``dataloaders/sbm_rgbd_loader.py:153-198``), vectorized in numpy:

For every second row, scanning outward from the row center, find the nearest
zero pixel at-or-left of center (else −1) and at-or-right of center (else
``cols``); the ROI x-range is the max/min of these over rows (and
symmetrically for columns over y). The returned boundary *includes* the
zero pixels themselves, matching the reference (whose crop slices are
``[lo : hi+1]``, ``sbm_rgbd_loader.py:387-391``).
"""
from typing import Optional, Tuple

import numpy as np

Boundary = Tuple[Tuple[int, int], Tuple[int, int]]  # ([x_min,x_max],[y_min,y_max])


def _scan_axis(img: np.ndarray) -> Tuple[int, int]:
    """For each row of ``img`` (2-D, rows scanned), find center-out zero
    boundaries; reduce with max(left)/min(right) over valid rows."""
    rows, cols = img.shape
    half = cols // 2
    zero = img == 0

    lo_reduced, hi_reduced = -1, 0xFFFFFFFF
    left = zero[:, : half + 1]  # indices 0..half
    right = zero[:, half:]  # indices half..cols-1
    col_idx_left = np.arange(half + 1)
    # nearest zero at-or-below center == max zero index in [0, half], else -1
    l_vals = np.where(left, col_idx_left[None, :], -1).max(axis=1)
    # nearest zero at-or-above center == min zero index in [half, cols-1], else cols
    col_idx_right = np.arange(half, cols)
    r_vals = np.where(right, col_idx_right[None, :], cols).min(axis=1)

    valid = l_vals < r_vals
    if valid.any():
        lo_reduced = max(lo_reduced, int(l_vals[valid].max()))
        hi_reduced = min(hi_reduced, int(r_vals[valid].min()))
    return lo_reduced, hi_reduced


def find_roi(img2d: np.ndarray, step: int = 2) -> Boundary:
    """([x_min, x_max], [y_min, y_max]); max indices are included in the ROI."""
    x_lo, x_hi = _scan_axis(np.asarray(img2d)[::step, :])
    y_lo, y_hi = _scan_axis(np.asarray(img2d).T[::step, :])
    return ((x_lo, x_hi), (y_lo, y_hi))


def crop_to_roi(img2d: np.ndarray, roi: Optional[Boundary]) -> np.ndarray:
    """Crop with the reference's inclusive-slice semantics
    (``sbm_rgbd_loader.py:387-391``)."""
    if roi is None:
        return img2d
    (x_lo, x_hi), (y_lo, y_hi) = roi
    return img2d[y_lo : y_hi + 1, x_lo : x_hi + 1]
