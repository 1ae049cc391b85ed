"""Evaluation metrics.

``compute_iou`` replicates the reference's *bitwise soft IoU* exactly
(``evaluation.py:3-21``): the un-thresholded 0..255 uint8 prediction is
bitwise-AND/OR'd against gt·255 as int16 and the ratio of sums taken; with
an empty GT the score is the predicted-background fraction (``:4-7``).
This is deliberately quirky (bitwise ops on intensity values) and is kept
bit-for-bit for parity.

``f_measure`` is the standard F-score at a 0.5 threshold — the additional
headline metric required by BASELINE.md (the reference computes none).

Both scores reduce to SIX integer counters over the (uint8 prediction,
binary GT) pair — and integers survive any device bit-exactly. The
device-metrics eval mode (``test.py --device-metrics``) computes the
counters inside the jit (:func:`metric_counters`) so only 24 bytes/frame
cross the tunneled relay instead of the 0.4 MB mask, then rebuilds the
IDENTICAL float64 scores on host (:func:`scores_from_counters`): gt·255 is
0 or 255, so the reference's quirky bitwise ops collapse to
``pred & gt255 == pred·gt`` and ``pred | gt255 == where(gt, 255, pred)``,
and every sum fits int32 (≤ 255·H·W ≈ 1.05e8 at 480×854 < 2³¹).
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


# ---------------------------------------------------------------------------
# Device-side metric counters (bit-exact integer reduction of the two scores)
# ---------------------------------------------------------------------------

N_COUNTERS = 6  # and_sum, or_sum, pred_nonzero, pred_pos, tp, gt_count


def pack_gt_bits(gt01: np.ndarray) -> np.ndarray:
    """[H, W] binary uint8 -> [H, ceil(W/8)] packed bits (8x smaller on the
    ~40 MB/s relay wire; the device unpacks with shifts)."""
    return np.packbits(gt01.astype(np.uint8), axis=-1)


def metric_counters(mask_u8, gt_bits):
    """Device-side counters: mask_u8 [B, H, W, 1] uint8 (the R-averaged
    sigmoid mask ×255 — exactly what the host scorer consumes), gt_bits
    [B, H, ceil(W/8)] uint8 packed binary GT. Returns [B, 6] int32.

    Counter semantics (must mirror :func:`compute_iou`/:func:`f_measure`):
      0 and_sum  = Σ (pred & gt·255)  = Σ pred·gt      (gt binary)
      1 or_sum   = Σ (pred | gt·255)  = Σ where(gt, 255, pred)
      2 pred_nonzero = #(pred != 0)    (empty-GT branch, evaluation.py:4-7)
      3 pred_pos = #(pred >= 128)      (F threshold)
      4 tp       = #(pred >= 128 ∧ gt)
      5 gt_count = Σ gt
    """
    import jax.numpy as jnp

    w = mask_u8.shape[2]
    pred = mask_u8[..., 0].astype(jnp.int32)  # [B, H, W]
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)  # packbits is MSB-first
    bits = (gt_bits[..., None] >> shifts) & jnp.uint8(1)
    gt = bits.reshape(bits.shape[0], bits.shape[1], -1)[:, :, :w].astype(jnp.int32)
    pos = pred >= 128
    counters = [
        jnp.sum(pred * gt, axis=(1, 2)),
        jnp.sum(jnp.where(gt == 1, 255, pred), axis=(1, 2)),
        jnp.sum((pred != 0).astype(jnp.int32), axis=(1, 2)),
        jnp.sum(pos.astype(jnp.int32), axis=(1, 2)),
        jnp.sum((pos & (gt == 1)).astype(jnp.int32), axis=(1, 2)),
        jnp.sum(gt, axis=(1, 2)),
    ]
    return jnp.stack(counters, axis=1)


def scores_from_counters(counters, hw) -> tuple:
    """(iou, f_measure) from one frame's int32 counters — float64 arithmetic
    replicating :func:`compute_iou` and :func:`f_measure` operation-for-
    operation, so the scores (and their printed log lines) are bit-identical
    to host scoring. ``hw`` is the scored mask's (H, W)."""
    and_sum, or_sum, pred_nonzero, pred_pos, tp, gt_count = (int(v) for v in counters)
    if gt_count == 0:
        iou = 1.0 - pred_nonzero / (hw[0] * hw[1])
        fm = 1.0 if pred_pos == 0 else 0.0
        return iou, fm
    iou = (and_sum * 1.0) / or_sum
    beta2 = 0.3
    precision = tp / max(pred_pos, 1)
    recall = tp / gt_count
    if precision + recall == 0:
        fm = 0.0
    else:
        fm = (1 + beta2) * precision * recall / (beta2 * precision + recall)
    return iou, fm
