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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Wire up ``jax.distributed`` for multi-host execution.

    On a real TPU pod slice, ``jax.distributed.initialize()`` auto-discovers
    the coordinator from the TPU metadata; elsewhere (CPU/GPU clusters,
    manual launch) the coordinator address / process count / process id must
    be passed — the same triple ``torchrun`` would carry for the reference's
    hypothetical DDP scale-out (its actual ceiling is single-process
    ``nn.DataParallel``, reference ``train.py:489-496``).

    Returns True if initialization ran, False if skipped (already
    initialized, or a single-process run with no coordinator to join).

    Deliberately does NOT touch ``jax.process_count()``/``jax.devices()``
    first — those would initialize the backend, after which joining a
    coordinator is impossible.
    """
    import os

    if coordinator_address is None and num_processes in (None, 1):
        # No explicit coordinator: auto-initialize only when the environment
        # is actually a MULTI-host TPU pod — more than one worker hostname in
        # the TPU metadata (a single-host TPU VM also sets the variable, with
        # one entry), or a megascale coordinator. jax.distributed.initialize()
        # then discovers coordinator/count/id itself. Plain single-host runs
        # skip without touching jax.distributed.
        hostnames = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        if len(hostnames) < 2 and not os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            return False  # single-process run: nothing to join
        args = {}
    else:
        args = dict(coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**args)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return False  # idempotent callers
        raise  # genuine failure (bad coordinator address, ...) must surface
    return True


def multi_host_mesh(ici_axis_size: Optional[int] = None,
                    replica_axis_size: Optional[int] = None) -> Mesh:
    """('replica', 'data') mesh for multi-host scale-out.

    The inner 'data' axis spans the chips of one host (collectives ride ICI);
    the outer 'replica' axis spans hosts (DCN). Sharding the batch over BOTH
    axes keeps the gradient reduction hierarchical: XLA emits a
    reduce-scatter/all-reduce over ICI first and the cross-host reduction
    over DCN. On a single host this degenerates to (1, n_local) and is
    equivalent to the flat data-parallel mesh unless ``replica_axis_size``
    forces a taller outer axis (the single-process dryrun shape). Call
    ``initialize_distributed`` first on real multi-host runs.
    """
    devices = jax.devices()
    if replica_axis_size:
        assert len(devices) % replica_axis_size == 0, (len(devices), replica_axis_size)
        local = len(devices) // replica_axis_size
    else:
        local = ici_axis_size or max(
            1, len([d for d in devices if d.process_index == devices[0].process_index])
        )
    assert len(devices) % local == 0, (len(devices), local)
    grid = np.array(devices).reshape(len(devices) // local, local)
    return Mesh(grid, axis_names=("replica", "data"))


def shard_batch_2d(batch: dict, mesh: Mesh) -> dict:
    """Batch sharded over BOTH mesh axes (multi-host DP)."""
    return shard_batch(batch, mesh, spec=P(("replica", "data")))


def shard_batch(batch: dict, mesh: Mesh, spec: Optional[P] = None) -> dict:
    """Place array values of a batch dict with the leading dim sharded over
    every mesh axis (flat DP: 'data'; hierarchical: ('replica', 'data'));
    non-arrays (seq names) pass through.

    Multi-process runs hand each host's *local* slice of the global batch to
    ``jax.make_array_from_process_local_data`` — hosts never materialize the
    full batch; single-process runs use a plain ``device_put``.
    """
    sharding = NamedSharding(mesh, spec if spec is not None else P(tuple(mesh.axis_names)))
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "shape"):
            if multiprocess:
                out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh.

    Python-scalar leaves (e.g. the LR-group multiplier tree) are converted
    to typed numpy scalars first: in a multi-process run jax cross-checks
    every ``device_put`` value across processes, and a python float that is
    not f32-representable (0.01, ...) fails that check spuriously — the
    gathered copy round-trips through f32 while the local value stays f64.
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, float):
            x = np.float32(x)
        elif isinstance(x, int):
            x = np.int32(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def compiled_batch_rows(batch_size: int, n_devices: int) -> int:
    """Leading-dim geometry every staged eval batch is padded to under a
    mesh: the smallest device multiple that fits a full batch. Short
    trailing batches pad UP to this — padding only to a device multiple
    would hand XLA a second input geometry (a fresh full-model compile,
    10-40 min cold through the tunneled TPU) for every distinct remainder."""
    return -(batch_size // -n_devices) * n_devices


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
