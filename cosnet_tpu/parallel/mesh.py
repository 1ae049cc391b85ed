"""Device mesh + sharding: the TPU-native replacement for DataParallel.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate model / scatter batch / gather outputs, ``train.py:489-496`` —
SURVEY.md §2 "Multi-GPU"). The TPU-native design is SPMD: one
``jax.sharding.Mesh`` over the chips with the batch sharded on a ``data``
axis and parameters replicated; under ``jax.jit`` the XLA SPMD partitioner
emits the gradient all-reduce over ICI automatically — there is no NCCL-like
call site in user code.

``--gpus a,b,...`` from the reference CLI maps to TPU device indices here.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(device_indices: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if device_indices:
        picked = [devices[i] for i in device_indices if i < len(devices)]
        if picked:
            devices = picked
    return Mesh(np.array(devices), axis_names=("data",))


def multi_host_mesh(ici_axis_size: Optional[int] = None) -> Mesh:
    """('replica', 'data') mesh for multi-host scale-out.

    The inner 'data' axis spans the chips of one host (collectives ride ICI);
    the outer 'replica' axis spans hosts (DCN). Sharding the batch over BOTH
    axes keeps the gradient reduction hierarchical: XLA emits a
    reduce-scatter/all-reduce over ICI first and the cross-host reduction
    over DCN. On a single host this degenerates to (1, n_local) and is
    equivalent to the flat data-parallel mesh. Multi-host initialization
    (``jax.distributed.initialize``) is the caller's responsibility.
    """
    devices = jax.devices()
    local = ici_axis_size or max(
        1, len([d for d in devices if d.process_index == devices[0].process_index])
    )
    assert len(devices) % local == 0, (len(devices), local)
    grid = np.array(devices).reshape(len(devices) // local, local)
    return Mesh(grid, axis_names=("replica", "data"))


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Batch sharded over BOTH mesh axes (multi-host DP)."""
    sharding = NamedSharding(mesh, P(("replica", "data")))
    return {
        k: jax.device_put(v, sharding) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place array values of a batch dict with the leading dim sharded over
    'data'; non-arrays (seq names) pass through."""
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "shape"):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch: dict, multiple: int):
    """Pad the leading dim so it divides the mesh size; returns (batch, n_real)."""
    sizes = {v.shape[0] for v in batch.values() if hasattr(v, "shape") and v.ndim > 0}
    n = sizes.pop() if sizes else 0
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim > 0 and v.shape[0] == n:
            pad_width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(np.asarray(v), pad_width, mode="edge")
        else:
            out[k] = v
    return out, n
