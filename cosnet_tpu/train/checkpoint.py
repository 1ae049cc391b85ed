"""Checkpoint save/restore — orbax native + reference ``.pth`` contract.

Reference contract (SURVEY.md §5.4): per-epoch ``torch.save({"epoch": e+1,
"model": state_dict})`` (``train.py:624-626``); resume restores epoch +
weights but **not** optimizer momentum (``train.py:501-508``) — preserved by
default, with ``restore_momentum=True`` available as an improvement.

Native checkpoints are orbax (full state incl. momentum); ``.pth``-schema
snapshots are emitted alongside for drop-in compatibility with the
reference's ``test.py``.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from cosnet_tpu.utils.torch_import import (
    load_pth,
    merge_variables,
    save_pth,
    state_dict_to_variables,
)


def save_epoch(snapshot_dir: str, dataset: str, epoch: int, state,
               pth: bool = True, orbax: bool = True):
    """Write both the orbax checkpoint and the reference-contract .pth.

    ``orbax=False``: multi-process runs snapshot via the .pth contract from
    process 0 only — ``StandardCheckpointer.save`` runs its own
    cross-process barrier internally, which deadlocks against a
    process-0-only call site (the .pth path is pure numpy and barrier-free).
    The momentum-less .pth matches the reference's resume semantics anyway
    (``train.py:501-508`` restores weights + epoch, not optimizer state)."""
    host_state = jax.tree.map(np.asarray, {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "momentum": state.momentum,
    })
    if orbax:
        ckpt_path = os.path.abspath(os.path.join(snapshot_dir, f"orbax_{dataset}_{epoch}"))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt_path, {"state": host_state, "epoch": np.asarray(epoch + 1)})
    if pth:
        # Same filename pattern as the reference: snapshot_<ds>_<epoch>.pth
        save_pth(
            os.path.join(snapshot_dir, f"snapshot_{dataset}_{epoch}.pth"),
            {"params": host_state["params"], "batch_stats": host_state["batch_stats"]},
            epoch + 1,
        )


def find_latest_checkpoint(snapshot_root: str) -> Optional[str]:
    """Newest orbax checkpoint under ``snapshots/<ds>/<model>/H..W../<ts>/``
    — the failure-recovery path: restart + ``--auto-resume`` continues from
    the last completed epoch (SURVEY.md §5.3)."""
    import glob

    candidates = glob.glob(os.path.join(snapshot_root, "*", "orbax_*"))
    if not candidates:
        return None

    def epoch_of(p):
        try:
            return int(p.rsplit("_", 1)[1])
        except ValueError:
            return -1

    return max(candidates, key=lambda p: (epoch_of(p), os.path.getmtime(p)))


def restore(path: str, state, restore_momentum: bool = False, mesh=None):
    """Restore from an orbax dir or a .pth file into an existing TrainState.

    ``mesh``: elastic resume — restore directly onto a (possibly different-
    sized) device mesh. Checkpoints are mesh-size-independent because the
    train state is fully replicated (DP); orbax places each restored array
    with the replicated NamedSharding of the NEW mesh, so a snapshot taken
    on N chips resumes on M without a host-side detour through numpy.

    Returns (state, start_epoch).
    """
    if path.endswith(".pth") or os.path.isfile(path):
        ckpt = load_pth(path)
        imported = state_dict_to_variables(ckpt["model"])
        params = merge_variables(jax.tree.map(np.asarray, state.params), imported["params"])
        stats = merge_variables(jax.tree.map(np.asarray, state.batch_stats), imported["batch_stats"])
        state = state.replace(
            params=jax.tree.map(jax.numpy.asarray, params),
            batch_stats=jax.tree.map(jax.numpy.asarray, stats),
        )
        return state, int(ckpt.get("epoch", 0))

    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "momentum": state.momentum,
    }
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())  # replicated over the new mesh
        # x.dtype reads device metadata without the full D2H copy np.asarray
        # would do on every leaf (jax and numpy arrays both expose it).
        target_state = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding),
            tree,
        )
    else:
        target_state = jax.tree.map(np.asarray, tree)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), {"state": target_state, "epoch": np.asarray(0)})
    st = restored["state"]
    state = state.replace(
        params=jax.tree.map(jax.numpy.asarray, st["params"]),
        batch_stats=jax.tree.map(jax.numpy.asarray, st["batch_stats"]),
    )
    if restore_momentum:
        state = state.replace(momentum=jax.tree.map(jax.numpy.asarray, st["momentum"]))
    return state, int(restored["epoch"])
