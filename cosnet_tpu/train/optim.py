"""Grouped SGD optimizer — torch-exact semantics with the reference's
two-LR-group schedule.

Reference behavior (SURVEY.md §2 "Train driver"):

* SGD(momentum=0.9, weight_decay=5e-4) (``train.py:538-540``): per step
  ``g += wd·p; buf = μ·buf + g; p -= lr·buf`` (no dampening, no nesterov);
* two parameter groups set *every iteration* by ``adjust_learning_rate``
  (``train.py:161-174``): the RGB encoder at ``0.01 × lr_poly`` and
  everything else (attention + depth + decoder) at ``10 × lr_poly`` — note
  group 0's constructor LR of 1× is overridden each step (reference quirk);
* ``lr_poly(base, it, max_it, power, epoch) = base · f(epoch) ·
  (1 − it/max_it)^power`` with f = 0.5 for epoch ≥ 6 else 1
  (``train.py:348-355``);
* frozen params: every downsample-BN scale/bias (``residual_net.py:132-133``)
  receives no update (requires_grad=False ⇒ grad None ⇒ SGD skips).

Implemented as an explicit pytree update (pure jax, jit-friendly) rather
than a torch port: group multipliers and the frozen mask are precomputed
per-leaf from parameter paths.
"""
from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp


def lr_poly(base_lr: float, iteration, max_iter: int, power: float, epoch) -> jnp.ndarray:
    factor = jnp.where(epoch >= 6, 0.5, 1.0)
    return base_lr * factor * (1.0 - iteration / max_iter) ** power


def group_multipliers(params, encoder_multiplier: float = 0.01, head_multiplier: float = 10.0):
    """Per-leaf LR multiplier tree: 'encoder/...' → 0.01, frozen
    downsample-BN affine params → 0.0, everything else → 10.0."""

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "downsample_bn" in keys:
            return 0.0
        return encoder_multiplier if keys and keys[0] == "encoder" else head_multiplier

    return jax.tree_util.tree_map_with_path(label, params)


@dataclasses.dataclass
class GroupedSGD:
    """torch-exact SGD with per-leaf LR multipliers and weight decay."""

    momentum: float = 0.9
    weight_decay: float = 5e-4

    def init(self, params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(self, grads, momentum_buffers, params, lr, multipliers, rates=None):
        """Returns (new_params, new_buffers). ``lr`` is the poly-scheduled
        scalar; per-leaf rate = lr × rate, with ``rates`` defaulting to the
        permanent ``multipliers`` tree. A separate ``rates`` tree supports
        per-step LR overrides (the salient-object alternating schedule,
        reference train.py:166-169) without touching the freeze mask: leaves
        with multiplier 0 are *permanently* frozen (params and buffers
        untouched, torch requires_grad=False semantics), while a rate of 0
        merely skips the param update this step (torch lr=0: the momentum
        buffer still integrates the gradient)."""
        mu, wd = self.momentum, self.weight_decay
        if rates is None:
            rates = multipliers

        def step(g, buf, p, mult, rate):
            g = g + wd * p  # torch: decay on all updated params
            buf = mu * buf + g
            new_p = p - lr * rate * buf
            # frozen leaves (mult == 0) keep params AND buffers untouched
            keep = mult == 0.0
            return jnp.where(keep, p, new_p), jnp.where(keep, buf * 0.0, buf)

        out = jax.tree.map(step, grads, momentum_buffers, params, multipliers, rates)
        new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        new_buffers = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        return new_params, new_buffers
