"""Model summary — the torchsummary analog (reference test.py:231-236).

Prints a per-module parameter table from the flax variable tree plus the
total parameter count (the reference's ``netParams``, train.py:358-374).
"""
from __future__ import annotations

import numpy as np


def _count(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return int(np.prod(np.shape(tree)))


def model_summary(variables: dict, depth: int = 2) -> str:
    """Readable table of parameter counts down to ``depth`` module levels."""
    params = variables.get("params", variables)
    lines = ["-" * 56, f"{'Module':<40}{'Params':>16}", "-" * 56]

    def walk(tree, path, level):
        if not isinstance(tree, dict) or level >= depth:
            lines.append(f"{'.'.join(path):<40}{_count(tree):>16,}")
            return
        has_subdict = any(isinstance(v, dict) for v in tree.values())
        if not has_subdict:
            lines.append(f"{'.'.join(path):<40}{_count(tree):>16,}")
            return
        for k, v in tree.items():
            walk(v, path + [k], level + 1)

    for k, v in params.items():
        walk(v, [k], 0)
    total = _count(params)
    stats = _count(variables.get("batch_stats", {}))
    lines += ["-" * 56, f"{'Total trainable params':<40}{total:>16,}"]
    if stats:
        lines.append(f"{'BatchNorm running stats':<40}{stats:>16,}")
    lines.append("-" * 56)
    return "\n".join(lines)
