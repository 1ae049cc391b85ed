"""Multi-host execution path (SURVEY.md §5.8 "DCN axis reserved for
multi-host"): hierarchical mesh construction, per-process batch sharding,
and the jax.distributed wiring contract. True multi-process runs need
multiple hosts; everything process-local is validated here on the 8-device
virtual CPU pool, and `train.py --multihost --replica-axis-size 2` drives
the same code path end-to-end (see test_train.py's 2D-mesh step test for
numerics)."""
import numpy as np
import pytest

import jax

from cosnet_tpu.data.pipeline import BatchLoader
from cosnet_tpu.parallel import initialize_distributed, multi_host_mesh


class _IntDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.array([i], np.int32)}


def test_multi_host_mesh_replica_axis():
    mesh = multi_host_mesh(replica_axis_size=2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    # default on one process: all devices on the inner (ICI) axis
    flat = multi_host_mesh()
    assert flat.devices.shape == (1, 8)


def test_multi_host_mesh_indivisible_rejected():
    with pytest.raises(AssertionError):
        multi_host_mesh(replica_axis_size=3)


def test_batchloader_process_shards_partition_global_batch():
    """Each process's loader yields a disjoint contiguous slice of the same
    seeded global batch; together the slices reconstruct it (the layout
    jax.make_array_from_process_local_data expects on ('replica', 'data'))."""
    ds = _IntDataset(32)
    full = BatchLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1)
    p0 = BatchLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1, process_shard=(0, 2))
    p1 = BatchLoader(ds, batch_size=8, shuffle=True, seed=7, num_workers=1, process_shard=(1, 2))
    for whole, a, b in zip(iter(full), iter(p0), iter(p1)):
        assert a["x"].shape[0] == 4 and b["x"].shape[0] == 4
        np.testing.assert_array_equal(np.concatenate([a["x"], b["x"]]), whole["x"])


def test_batchloader_process_shard_requires_divisible_batch():
    with pytest.raises(ValueError):
        BatchLoader(_IntDataset(8), batch_size=6, shuffle=False, process_shard=(0, 4))


def test_initialize_distributed_single_process_noop():
    # No coordinator and one process: nothing to join, backend untouched.
    assert initialize_distributed() is False
    assert initialize_distributed(num_processes=1) is False
    assert jax.process_count() == 1


def test_initialize_distributed_pod_autodetect(monkeypatch):
    """With >1 worker hostname in the TPU metadata (a real multi-host pod),
    all-None args must reach jax.distributed.initialize() for
    auto-discovery; a single hostname (every TPU VM sets the variable) must
    not."""
    from cosnet_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda **kw: calls.append(kw))
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b,host-c,host-d")
    assert mesh_mod.initialize_distributed() is True
    assert calls == [{}]  # auto-discovery: no explicit coordinator args

    calls.clear()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert mesh_mod.initialize_distributed() is False
    assert calls == []
