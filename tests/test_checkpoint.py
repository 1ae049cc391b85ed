"""Checkpoint contracts: orbax roundtrip + .pth export loadable by the reference."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck
from cosnet_tpu.train.checkpoint import restore, save_epoch
from cosnet_tpu.train.optim import GroupedSGD
from cosnet_tpu.train.state import TrainState
from cosnet_tpu.utils.torch_import import (
    load_pth, state_dict_to_variables, variables_to_state_dict,
)
from tests._reference import get_reference

BLOCKS = [1, 1, 1, 1]


@pytest.fixture(scope="module")
def state():
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    dummy = [jnp.zeros((1, 16, 16, 3))] * 2 + [jnp.zeros((1, 16, 16, 1))] * 2
    variables = model.init(jax.random.key(1), *dummy, train=False)
    return TrainState.create(variables, GroupedSGD())


def test_orbax_roundtrip(tmp_path, state):
    save_epoch(str(tmp_path), "sbmrgbd", 3, state, pth=False)
    blank = state.replace(params=jax.tree.map(jnp.zeros_like, state.params))
    restored, epoch = restore(str(tmp_path / "orbax_sbmrgbd_3"), blank)
    assert epoch == 4
    a = np.asarray(state.params["gate"]["kernel"])
    b = np.asarray(restored.params["gate"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_pth_export_loads_into_reference_model(tmp_path, state):
    """The exported .pth must satisfy the reference's strict load_state_dict."""
    raa_mod, RefB = get_reference()
    save_epoch(str(tmp_path), "sbmrgbd", 0, state, pth=True)
    path = os.path.join(str(tmp_path), "snapshot_sbmrgbd_0.pth")
    ckpt = load_pth(path)
    assert ckpt["epoch"] == 1

    ref = raa_mod.RGBDSegmentation_RAA(RefB, BLOCKS, BLOCKS, num_classes=1)
    # STRICT load — the reference's own test.py loads snapshots strictly
    # (test.py:228), so the export must be a complete drop-in.
    ref.load_state_dict({k: v for k, v in ckpt["model"].items()}, strict=True)

    # roundtrip: reference state_dict -> variables -> state_dict is identity
    back = state_dict_to_variables(ckpt["model"])
    again = variables_to_state_dict(back)
    assert set(again) == set(ckpt["model"])
    for k, v in again.items():
        np.testing.assert_array_equal(v, np.asarray(ckpt["model"][k]), err_msg=k)


def test_pth_export_forward_matches(tmp_path, state):
    """Reference model loaded from our export == our model numerically."""
    raa_mod, RefB = get_reference()
    save_epoch(str(tmp_path), "sbmrgbd", 0, state, pth=True)
    ckpt = load_pth(os.path.join(str(tmp_path), "snapshot_sbmrgbd_0.pth"))
    ref = raa_mod.RGBDSegmentation_RAA(RefB, BLOCKS, BLOCKS, num_classes=1)
    ref.load_state_dict(ckpt["model"], strict=True)
    ref.eval()

    rng = np.random.default_rng(0)
    rgb = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    d = rng.standard_normal((1, 1, 32, 32), dtype=np.float32)
    with torch.no_grad():
        t1, _, _ = ref(*(torch.from_numpy(v) for v in (rgb, rgb, d, d)))

    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    x1, _, _ = model.apply(state.variables, nhwc(rgb), nhwc(rgb), nhwc(d), nhwc(d), train=False)
    np.testing.assert_allclose(np.asarray(x1)[..., 0], t1.numpy()[:, 0], rtol=1e-4, atol=1e-4)


def test_elastic_mesh_resume(tmp_path, state):
    """Elastic reshaping: a checkpoint saved from an 8-device mesh restores
    directly onto a 4-device mesh (replicated state is mesh-size-independent;
    orbax places arrays with the NEW mesh's sharding)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cosnet_tpu.parallel import replicate

    mesh8 = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    state8 = replicate(state, mesh8)
    save_epoch(str(tmp_path), "sbmrgbd", 5, state8, pth=False)

    mesh4 = Mesh(np.array(jax.devices()[:4]), axis_names=("data",))
    blank = state.replace(params=jax.tree.map(jnp.zeros_like, state.params))
    restored, epoch = restore(str(tmp_path / "orbax_sbmrgbd_5"), blank, mesh=mesh4)
    assert epoch == 6
    kern = restored.params["gate"]["kernel"]
    assert kern.sharding == NamedSharding(mesh4, P())
    assert {d.id for d in kern.sharding.device_set} == {d.id for d in jax.devices()[:4]}
    np.testing.assert_array_equal(np.asarray(kern), np.asarray(state.params["gate"]["kernel"]))
