"""Import reference ``.pth`` checkpoints into flax variable trees.

Implements the reference's three checkpoint key schemas (SURVEY.md §5.4):

* ``module.``-prefix stripping for DataParallel-saved snapshots
  (reference ``test.py:140-161``, ``rgbd_segmentation_RAA.py:106-112``);
* the cross-lineage remap table of ``RGBDSegmentation_RAA.load_state``
  (``rgbd_segmentation_RAA.py:114-134``): ``encoder.layer5→encoder.aspp``,
  bare ``encoder.*→encoder.backbone.*``, ``linear_e→rgb_similarity_weights``,
  ``conv1/conv2→reduce_channels_A/B``, ``bn1/bn2→bn_A/bn_B``,
  ``main_classifier1/2→segmentation_classifier_A/B``;
* tensor layout conversion to flax/NHWC: conv OIHW→HWIO, linear [out,in]→
  kernel [in,out], BN weight/bias→scale/bias + running stats→batch_stats.

The loader is torch-free at the format level when possible (torch-CPU is
used only to deserialize ``.pth`` pickles); everything downstream is numpy.
"""
from __future__ import annotations

import re

import numpy as np


# ---------------------------------------------------------------------------
# Key canonicalization
# ---------------------------------------------------------------------------

_LINEAGE_RENAMES = [
    ("linear_e.", "rgb_similarity_weights."),
    ("conv1.", "reduce_channels_A."),
    ("conv2.", "reduce_channels_B."),
    ("bn1.", "bn_A."),
    ("bn2.", "bn_B."),
    ("main_classifier1.", "segmentation_classifier_A."),
    ("main_classifier2.", "segmentation_classifier_B."),
]


def canonicalize_key(key: str) -> str:
    """Apply the ``load_state`` remap (reference rgbd_segmentation_RAA.py:103-134)."""
    if key.startswith("module."):
        key = key[len("module."):]
    if key.startswith("encoder.layer5."):
        return "encoder.aspp." + key[len("encoder.layer5."):]
    if key.startswith("encoder.main_classifier"):
        return key
    if key.startswith("encoder.backbone.") or key.startswith("encoder.aspp."):
        return key  # already canonical (self-saved snapshot)
    if key.startswith("encoder."):
        return "encoder.backbone." + key[len("encoder."):]
    for old, new in _LINEAGE_RENAMES:
        if key.startswith(old):
            return new + key[len(old):]
    return key


# ---------------------------------------------------------------------------
# Tensor conversion
# ---------------------------------------------------------------------------

_BN_STAT = {"running_mean": "mean", "running_var": "var"}
_BN_PARAM = {"weight": "scale", "bias": "bias"}

# Module names that are torch Linear layers (stored as bare flax params).
_LINEAR_NAMES = {"rgb_similarity_weights", "depth_similarity_weights"}
# Module-name fragments that are BatchNorm layers.
_BN_RE = re.compile(r"^(bn\w*|downsample_bn|depth_bn|bn_[AB]|bn_x)$")


def _to_flax_path(canonical_key: str):
    """Map a canonical reference key to (collection, path tuple, converter).

    Returns None for keys with no flax counterpart (num_batches_tracked).
    """
    parts = canonical_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]
    if leaf == "num_batches_tracked":
        return None

    # torch "layerX.Y" -> flax "layerX_Y"; "downsample.0/1" -> downsample_conv/bn
    out = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if re.fullmatch(r"layer[1-4]", m) and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(f"{m}_{mods[i+1]}")
            i += 2
            continue
        if m == "downsample" and i + 1 < len(mods) and mods[i + 1] in ("0", "1"):
            out.append("downsample_conv" if mods[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        out.append(m)
        i += 1

    mod_name = out[-1] if out else ""

    if mod_name in _LINEAR_NAMES:
        # torch Linear weight [out,in] -> bare flax param [in,out]
        return ("params", tuple(out), lambda t: np.ascontiguousarray(np.asarray(t).T))

    if _BN_RE.match(mod_name):
        if leaf in _BN_STAT:
            return ("batch_stats", tuple(out) + (_BN_STAT[leaf],), np.asarray)
        return ("params", tuple(out) + (_BN_PARAM[leaf],), np.asarray)

    if mod_name == "prelu":
        # torch PReLU weight shape [1] -> flax scalar negative_slope
        return ("params", tuple(out) + ("negative_slope",), lambda t: np.asarray(t).reshape(()))

    if leaf == "weight":
        return ("params", tuple(out) + ("kernel",), _conv_or_linear_kernel)
    if leaf == "bias":
        return ("params", tuple(out) + ("bias",), np.asarray)

    raise KeyError(f"unhandled reference key: {canonical_key}")


def _conv_or_linear_kernel(t):
    a = np.asarray(t)
    if a.ndim == 4:  # conv OIHW -> HWIO
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    if a.ndim == 2:  # linear [out,in] -> [in,out]
        return np.ascontiguousarray(a.T)
    return a


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def state_dict_to_variables(state_dict) -> dict:
    """Convert a reference state_dict (any of its key schemas) into a flax
    variables dict ``{"params": ..., "batch_stats": ...}`` of numpy arrays."""
    variables = {"params": {}, "batch_stats": {}}
    for key, tensor in state_dict.items():
        mapped = _to_flax_path(canonicalize_key(key))
        if mapped is None:
            continue
        collection, path, convert = mapped
        node = variables[collection]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = convert(_to_numpy(tensor))
    return variables


def _to_numpy(t):
    # Always copy: numpy() views torch storage, and jax can zero-copy aligned
    # CPU arrays — an aliased buffer would let later in-place torch updates
    # (e.g. BN running stats) corrupt the imported variables.
    if hasattr(t, "detach"):
        return np.array(t.detach().cpu().numpy())
    return np.array(t)


def merge_variables(base: dict, update: dict) -> dict:
    """Recursively overlay ``update`` onto ``base`` (partial checkpoint load —
    the reference's ``new_params = self.state_dict().copy()`` semantics,
    rgbd_segmentation_RAA.py:104). Paths in ``update`` absent from ``base``
    are ignored (reported by ``unmatched_paths``)."""
    merged = dict(base)
    for k, v in update.items():
        if k in merged and isinstance(merged[k], dict) and isinstance(v, dict):
            merged[k] = merge_variables(merged[k], v)
        elif k in merged and not isinstance(v, dict):
            merged[k] = np.asarray(v, dtype=np.asarray(merged[k]).dtype).reshape(np.shape(merged[k]))
        elif k in merged:
            merged[k] = v
    return merged


def fully_covers(base: dict, update: dict) -> bool:
    """True iff EVERY leaf path of ``base`` exists in ``update`` with a
    compatible leaf — i.e. a merge would overwrite the whole tree and
    ``base``'s values are dead (lets the serving path skip computing real
    init values). Leaf-compatible means the update value is a non-dict of
    the same element count (merge_variables reshapes, so layout may
    differ); any mismatch returns False and the caller falls back to real
    init + merge, which reports the problem diagnosably."""
    for k, v in base.items():
        if k not in update:
            return False
        if isinstance(v, dict):
            if not isinstance(update[k], dict) or not fully_covers(v, update[k]):
                return False
        else:
            if isinstance(update[k], dict):
                return False
            base_shape = getattr(v, "shape", None)  # ShapeDtypeStruct or array
            if base_shape is None:
                base_shape = np.shape(v)
            if int(np.size(update[k])) != int(np.prod(base_shape, dtype=np.int64)):
                return False
    return True


def unmatched_paths(base: dict, update: dict, prefix=()):
    """Paths present in ``update`` but missing from ``base`` (for logging)."""
    missing = []
    for k, v in update.items():
        if k not in base:
            missing.append("/".join(prefix + (k,)))
        elif isinstance(v, dict) and isinstance(base[k], dict):
            missing.extend(unmatched_paths(base[k], v, prefix + (k,)))
    return missing


def load_pth(path: str) -> dict:
    """Load a reference ``.pth`` checkpoint; returns the raw dict
    (typically ``{"epoch": int, "model": state_dict}``)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference-canonical state_dict
# ---------------------------------------------------------------------------

def _flatten(tree: dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


_LAYER_RE = re.compile(r"^(layer[1-4])_(\d+)$")


def variables_to_state_dict(variables: dict) -> dict:
    """Emit a numpy state_dict in the reference's canonical key schema
    (``encoder.backbone.layer1.0.conv1.weight`` etc.) so snapshots can be
    loaded by the reference's ``test.py``/``load_state`` unchanged."""
    out = {}
    for path, leaf in _flatten(variables.get("params", {})):
        mods, leafname = list(path[:-1]), path[-1]
        mods = _torch_module_path(mods)
        arr = np.asarray(leaf)
        if leafname == "kernel":
            if arr.ndim == 4:
                arr = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # HWIO->OIHW
            elif arr.ndim == 2:
                arr = np.ascontiguousarray(arr.T)
            out[".".join(mods + ["weight"])] = arr
        elif leafname == "scale":
            out[".".join(mods + ["weight"])] = arr
        elif leafname == "bias":
            out[".".join(mods + ["bias"])] = arr
        elif leafname == "negative_slope":
            out[".".join(mods + ["weight"])] = arr.reshape(1)
        elif leafname in ("rgb_similarity_weights", "depth_similarity_weights"):
            # bare Linear param [in,out] -> torch weight [out,in]
            out[".".join(mods + [leafname, "weight"])] = np.ascontiguousarray(arr.T)
        else:
            out[".".join(mods + [leafname])] = arr
    for path, leaf in _flatten(variables.get("batch_stats", {})):
        mods, leafname = list(path[:-1]), path[-1]
        mods = _torch_module_path(mods)
        name = {"mean": "running_mean", "var": "running_var"}[leafname]
        out[".".join(mods + [name])] = np.asarray(leaf)
        if leafname == "mean":
            # torch BN tracks an update counter; the reference's test.py
            # loads snapshots with STRICT load_state_dict (test.py:228), so
            # drop-in compatibility requires emitting it.
            out[".".join(mods + ["num_batches_tracked"])] = np.asarray(0, dtype=np.int64)
    return out


def _torch_module_path(mods):
    out = []
    for m in mods:
        match = _LAYER_RE.match(m)
        if match:
            out.extend([match.group(1), match.group(2)])
        elif m == "downsample_conv":
            out.extend(["downsample", "0"])
        elif m == "downsample_bn":
            out.extend(["downsample", "1"])
        else:
            out.append(m)
    return out


def save_pth(path: str, variables: dict, epoch: int):
    """Write the reference snapshot contract {"epoch", "model"} (train.py:624-626)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in variables_to_state_dict(variables).items()}
    torch.save({"epoch": epoch, "model": sd}, path)
