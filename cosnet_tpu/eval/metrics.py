"""Evaluation metrics.

``compute_iou`` replicates the reference's *bitwise soft IoU* exactly
(``evaluation.py:3-21``): the un-thresholded 0..255 uint8 prediction is
bitwise-AND/OR'd against gt·255 as int16 and the ratio of sums taken; with
an empty GT the score is the predicted-background fraction (``:4-7``).
This is deliberately quirky (bitwise ops on intensity values) and is kept
bit-for-bit for parity.

``f_measure`` is the standard F-score at a 0.5 threshold — the additional
headline metric required by BASELINE.md (the reference computes none).
"""
import numpy as np


def compute_iou(prediction_0_255: np.ndarray, gt01: np.ndarray) -> float:
    prediction_0_255 = np.asarray(prediction_0_255)
    gt01 = np.asarray(gt01)
    if np.all(gt01 == 0):
        return 1.0 - np.count_nonzero(prediction_0_255) / (
            prediction_0_255.shape[0] * prediction_0_255.shape[1]
        )
    pred = prediction_0_255.astype(np.int16)
    gt = (gt01 * 255).astype(np.int16)
    sum_and = np.sum(pred & gt) * 1.0
    sum_or = np.sum(pred | gt)
    return sum_and / sum_or


def f_measure(prediction_0_255: np.ndarray, gt01: np.ndarray, threshold: int = 128, beta2: float = 0.3) -> float:
    """F-measure with beta²=0.3 (saliency convention) at a fixed threshold."""
    pred = np.asarray(prediction_0_255) >= threshold
    gt = np.asarray(gt01) != 0
    tp = np.logical_and(pred, gt).sum()
    if gt.sum() == 0:
        return 1.0 if pred.sum() == 0 else 0.0
    precision = tp / max(pred.sum(), 1)
    recall = tp / gt.sum()
    if precision + recall == 0:
        return 0.0
    return (1 + beta2) * precision * recall / (beta2 * precision + recall)
