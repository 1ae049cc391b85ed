"""Training losses — class-balanced BCE + L1, parity with the reference.

Reference (``train.py:176-216``): per output branch,
``loss = BCE_weighted(pred, gt) + 0.8 * L1(pred, gt)``, summed over both
siamese branches (``train.py:595-597``). The BCE weight is the constant
``total_pixels / num_positive_pixels`` broadcast over every element (the
fewer positives, the larger every pixel's contribution); with an empty GT
the unweighted BCE is used (``train.py:185-187``). Implemented branch-free
for jit: the weight becomes 1.0 when there are no positives.

torch.nn.BCELoss clamps each log term at -100; replicated exactly.
"""
import jax.numpy as jnp

BCE_LOG_CLAMP = -100.0  # torch BCELoss clamp


def weighted_bce_loss(pred, label):
    """pred, label: [N, H, W, 1] (or any layout); label in [0, 1] floats."""
    labels01 = (label >= 0.5).astype(jnp.float32)
    num_pos = jnp.sum(labels01)
    # total = N*H*W — the reference's label_size[0]*[2]*[3] excludes the
    # channel dim (train.py:190-192).
    shape = label.shape
    total = shape[0] * shape[1] * shape[2] if label.ndim == 4 else label.size
    weight = jnp.where(num_pos > 0, total / jnp.maximum(num_pos, 1.0), 1.0)

    p = pred.astype(jnp.float32)
    y = label.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), BCE_LOG_CLAMP)
    log_1mp = jnp.maximum(jnp.log1p(-p), BCE_LOG_CLAMP)
    bce = -(y * log_p + (1.0 - y) * log_1mp)
    return weight * jnp.mean(bce)


def l1_loss(pred, label):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - label.astype(jnp.float32)))


def segmentation_pair_loss(pred1, gt1, pred2=None, gt2=None, l1_weight: float = 0.8):
    """Dual-branch loss (train.py:595-597); pred2/gt2 optional to support the
    reference's ``ignore_counterpart_loss`` switch."""
    loss = weighted_bce_loss(pred1, gt1) + l1_weight * l1_loss(pred1, gt1)
    if pred2 is not None:
        loss = loss + weighted_bce_loss(pred2, gt2) + l1_weight * l1_loss(pred2, gt2)
    return loss
