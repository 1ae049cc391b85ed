"""Training layer: loss/optimizer parity vs torch, train-step behavior, DP."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck
from cosnet_tpu.train.losses import l1_loss, segmentation_pair_loss, weighted_bce_loss
from cosnet_tpu.train.optim import GroupedSGD, group_multipliers, lr_poly
from cosnet_tpu.train.state import TrainState, make_train_step


# ---------------------------------------------------------------------------
# Loss parity (reference train.py:176-216)
# ---------------------------------------------------------------------------

def _torch_weighted_bce(pred, label):
    labels = torch.ge(label, 0.5).int()
    num_pos = torch.sum(labels).item()
    if num_pos == 0:
        criterion = torch.nn.BCELoss()
    else:
        size = label.size()
        total = size[0] * size[2] * size[3]
        weight = torch.mul(total / num_pos, torch.ones(*size))
        criterion = torch.nn.BCELoss(weight=weight)
    return criterion(pred, label)


@pytest.mark.parametrize("fg_fraction", [0.3, 0.01, 0.0])
def test_weighted_bce_matches_torch(fg_fraction):
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 0.99, (2, 1, 8, 10)).astype(np.float32)
    label = (rng.uniform(0, 1, (2, 1, 8, 10)) < fg_fraction).astype(np.float32)
    want = float(_torch_weighted_bce(torch.from_numpy(pred), torch.from_numpy(label)))
    # ours is NHWC
    got = float(weighted_bce_loss(jnp.asarray(pred.transpose(0, 2, 3, 1)), jnp.asarray(label.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l1_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 1, (2, 4, 5, 1)).astype(np.float32)
    label = rng.uniform(0, 1, (2, 4, 5, 1)).astype(np.float32)
    want = float(torch.nn.L1Loss()(torch.from_numpy(pred), torch.from_numpy(label)))
    got = float(l1_loss(jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# Optimizer parity vs torch SGD with two LR groups (train.py:538-540,161-174)
# ---------------------------------------------------------------------------

def test_grouped_sgd_matches_torch_sgd():
    rng = np.random.default_rng(2)
    w_enc = rng.standard_normal((3, 3)).astype(np.float32)
    w_head = rng.standard_normal((3,)).astype(np.float32)
    params = {"encoder": {"w": jnp.asarray(w_enc)}, "gate": {"w": jnp.asarray(w_head)}}
    mult = group_multipliers(params)
    assert float(jax.tree.leaves(mult["encoder"])[0]) == 0.01
    assert float(jax.tree.leaves(mult["gate"])[0]) == 10.0

    t_enc = torch.nn.Parameter(torch.from_numpy(w_enc.copy()))
    t_head = torch.nn.Parameter(torch.from_numpy(w_head.copy()))
    opt = torch.optim.SGD(
        [{"params": [t_enc], "lr": 0.0}, {"params": [t_head], "lr": 0.0}],
        lr=0.0, momentum=0.9, weight_decay=5e-4,
    )

    sgd = GroupedSGD(momentum=0.9, weight_decay=5e-4)
    mom = sgd.init(params)
    for step in range(3):
        lr = 0.01 * (1 - step / 10) ** 0.9
        g_enc = rng.standard_normal(w_enc.shape).astype(np.float32)
        g_head = rng.standard_normal(w_head.shape).astype(np.float32)
        # torch: per-group LRs set every iter (adjust_learning_rate semantics)
        opt.param_groups[0]["lr"] = 0.01 * lr
        opt.param_groups[1]["lr"] = 10 * lr
        opt.zero_grad()
        t_enc.grad = torch.from_numpy(g_enc.copy())
        t_head.grad = torch.from_numpy(g_head.copy())
        opt.step()
        grads = {"encoder": {"w": jnp.asarray(g_enc)}, "gate": {"w": jnp.asarray(g_head)}}
        params, mom = sgd.update(grads, mom, params, lr, mult)

    np.testing.assert_allclose(np.asarray(params["encoder"]["w"]), t_enc.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["gate"]["w"]), t_head.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_lr_poly_schedule():
    # reference train.py:348-355: factor 1 below epoch 6, then 0.5
    assert float(lr_poly(1.0, 0, 100, 0.9, 0)) == 1.0
    np.testing.assert_allclose(float(lr_poly(1.0, 50, 100, 0.9, 3)), 0.5 ** 0.9)
    np.testing.assert_allclose(float(lr_poly(1.0, 0, 100, 0.9, 6)), 0.5)


# ---------------------------------------------------------------------------
# Train step end-to-end (tiny model) + DP equivalence on the 8-device mesh
# ---------------------------------------------------------------------------

BLOCKS = [1, 1, 1, 1]


def _tiny_setup(batch=2, hw=(32, 32), seed=0):
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    rng = np.random.default_rng(seed)
    batch_d = {
        "target": jnp.asarray(rng.standard_normal((batch, *hw, 3), dtype=np.float32)),
        "search_0": jnp.asarray(rng.standard_normal((batch, *hw, 3), dtype=np.float32)),
        "target_depth": jnp.asarray(rng.standard_normal((batch, *hw, 1), dtype=np.float32)),
        "search_0_depth": jnp.asarray(rng.standard_normal((batch, *hw, 1), dtype=np.float32)),
        "target_gt": jnp.asarray((rng.uniform(0, 1, (batch, *hw)) < 0.3).astype(np.float32)),
        "search_0_gt": jnp.asarray((rng.uniform(0, 1, (batch, *hw)) < 0.3).astype(np.float32)),
    }
    variables = model.init(jax.random.key(0), batch_d["target"][:1], batch_d["search_0"][:1],
                           batch_d["target_depth"][:1], batch_d["search_0_depth"][:1], train=False)
    optimizer = GroupedSGD()
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, optimizer)
    return model, state, step, batch_d


def test_train_step_updates_and_freezes():
    _, state, step, batch = _tiny_setup()
    frozen_before = np.asarray(
        state.params["encoder"]["backbone"]["layer1_0"]["downsample_bn"]["scale"]
    )
    enc_before = np.asarray(state.params["encoder"]["backbone"]["conv1"]["kernel"])
    bs_before = np.asarray(state.batch_stats["encoder"]["backbone"]["bn1"]["mean"])

    jitted = jax.jit(step)
    state2, loss1 = jitted(state, batch, 1e-4)
    state3, loss2 = jitted(state2, batch, 1e-4)
    for _ in range(3):
        state3, loss2 = jitted(state3, batch, 1e-4)

    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # frozen downsample BN untouched
    np.testing.assert_array_equal(
        np.asarray(state3.params["encoder"]["backbone"]["layer1_0"]["downsample_bn"]["scale"]),
        frozen_before,
    )
    # encoder conv updated; BN stats mutated
    assert not np.array_equal(np.asarray(state3.params["encoder"]["backbone"]["conv1"]["kernel"]), enc_before)
    assert not np.array_equal(np.asarray(state3.batch_stats["encoder"]["backbone"]["bn1"]["mean"]), bs_before)
    # same batch twice: loss should drop
    assert float(loss2) < float(loss1)


def test_train_step_data_parallel_matches_single_device():
    from cosnet_tpu.parallel import data_parallel_mesh, replicate, shard_batch

    _, state, step, batch = _tiny_setup(batch=8)
    jitted = jax.jit(step)
    ref_state, ref_loss = jitted(state, batch, 0.01)

    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    with mesh:
        dp_state = replicate(state, mesh)
        dp_batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
        dp_state, dp_loss = jitted(dp_state, dp_batch, 0.01)

    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    # Param updates agree up to cross-device float reduction order (the grad
    # psum over 8 shards reassociates sums; amplified by the 10x head LR).
    a = np.asarray(ref_state.params["gate"]["kernel"])
    b = np.asarray(dp_state.params["gate"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-5)


def test_train_step_on_2d_multi_host_mesh():
    """('replica','data') hierarchical DP == flat single-device result."""
    import numpy as np
    from jax.sharding import Mesh
    from cosnet_tpu.parallel import replicate
    from cosnet_tpu.parallel.mesh import shard_batch_2d

    _, state, step, batch = _tiny_setup(batch=8)
    jitted = jax.jit(step)
    ref_state, ref_loss = jitted(state, batch, 1e-4)

    grid = np.array(jax.devices()).reshape(2, 4)  # 2 "hosts" x 4 "chips"
    mesh = Mesh(grid, axis_names=("replica", "data"))
    with mesh:
        dp_state = replicate(state, mesh)
        dp_batch = shard_batch_2d({k: np.asarray(v) for k, v in batch.items()}, mesh)
        dp_state, dp_loss = jitted(dp_state, dp_batch, 1e-4)
    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    a = np.asarray(ref_state.params["gate"]["kernel"])
    b = np.asarray(dp_state.params["gate"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-5)


def test_context_parallel_ring_train_step_matches_einsum():
    """train.py --context-parallel ring: a full train step with the
    co-attention tokens ring-sharded over the 8-device mesh (batch
    replicated — CP is the memory axis, not a throughput axis) must match
    the single-device einsum step. Pins the training reachability of ring
    CP (SURVEY §5.7; eval reachability was pinned in round 2)."""
    from jax.sharding import PartitionSpec as P
    from cosnet_tpu.parallel import data_parallel_mesh, replicate
    from cosnet_tpu.parallel.context_parallel import (
        disable_context_parallel, enable_context_parallel,
    )
    from cosnet_tpu.parallel.mesh import shard_batch

    model, state, step, batch = _tiny_setup(batch=2)
    ref_state, ref_loss = jax.jit(step)(state, batch, 1e-4)

    mesh = data_parallel_mesh()
    cp_model = model.clone(coattention_backend="ring")
    cp_step = make_train_step(cp_model, GroupedSGD())
    enable_context_parallel(mesh, "data", chunk_backend="einsum")
    try:
        with mesh:
            cp_state = replicate(state, mesh)
            cp_batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh, spec=P())
            cp_state, cp_loss = jax.jit(cp_step)(cp_state, cp_batch, 1e-4)
    finally:
        disable_context_parallel()

    np.testing.assert_allclose(float(cp_loss), float(ref_loss), rtol=1e-5)
    a = np.asarray(ref_state.params["gate"]["kernel"])
    b = np.asarray(cp_state.params["gate"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-5)
    # the depth branch's co-attention gradients flowed through the ring too
    da = np.asarray(ref_state.params["depth_gate"]["kernel"])
    db = np.asarray(cp_state.params["depth_gate"]["kernel"])
    np.testing.assert_allclose(da, db, rtol=0.05, atol=1e-5)


def test_alternating_salient_step_freezes_heads():
    """Reference train.py:166-169 (dead branch): on salient steps group0
    (encoder) trains at 1x lr and group1 (attention/depth/decoder) at 0."""
    model, state, _, batch = _tiny_setup()
    optimizer = GroupedSGD()
    step = jax.jit(make_train_step(model, optimizer, alternating=True))

    enc0 = np.asarray(state.params["encoder"]["backbone"]["conv1"]["kernel"])
    gate0 = np.asarray(state.params["gate"]["kernel"])

    s_sal, _ = step(state, batch, 1e-4, True)
    assert not np.array_equal(np.asarray(s_sal.params["encoder"]["backbone"]["conv1"]["kernel"]), enc0)
    np.testing.assert_array_equal(np.asarray(s_sal.params["gate"]["kernel"]), gate0)
    # momentum still integrates the head gradient on the frozen step (torch lr=0)
    assert np.any(np.asarray(s_sal.momentum["gate"]["kernel"]) != 0)

    s_norm, _ = step(state, batch, 1e-4, False)
    assert not np.array_equal(np.asarray(s_norm.params["gate"]["kernel"]), gate0)
    # permanently frozen downsample-BN never moves in either mode
    np.testing.assert_array_equal(
        np.asarray(s_sal.params["encoder"]["backbone"]["layer1_0"]["downsample_bn"]["scale"]),
        np.asarray(state.params["encoder"]["backbone"]["layer1_0"]["downsample_bn"]["scale"]),
    )


def test_train_step_through_pallas_backward():
    """--coattention-backend pallas now trains through the flash VJP kernels
    (no einsum fallback, no HW x HW affinity under grad)."""
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS,
                                coattention_backend="pallas")
    _, state, _, batch = _tiny_setup()
    optimizer = GroupedSGD()
    step_p = jax.jit(make_train_step(model, optimizer))
    step_e = jax.jit(make_train_step(model.clone(coattention_backend="einsum"), optimizer))

    sp, lp = step_p(state, batch, 1e-4)
    se, le = step_e(state, batch, 1e-4)
    np.testing.assert_allclose(float(lp), float(le), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sp.params["gate"]["kernel"]),
        np.asarray(se.params["gate"]["kernel"]), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Mixed precision (--dtype bfloat16) and block rematerialization (--remat)
# ---------------------------------------------------------------------------


def test_remat_train_step_matches_nonremat():
    """nn.remat(Bottleneck) (train.py --remat) recomputes block activations in
    the backward pass; the update must match the stored-activation step (remat
    is mathematically exact) and the param tree must be unchanged."""
    import flax.linen as nn

    model, state, step, batch = _tiny_setup()
    rblock = nn.remat(Bottleneck, static_argnums=(2,))  # as create_model(remat=True)
    rmodel = RGBDSegmentationRAA(block=rblock, num_blocks_rgb=BLOCKS, num_blocks_depth=BLOCKS)
    assert (
        jax.tree_util.tree_structure(jax.eval_shape(
            lambda: rmodel.init(jax.random.key(0), batch["target"][:1], batch["search_0"][:1],
                                batch["target_depth"][:1], batch["search_0_depth"][:1], train=False)))
        == jax.tree_util.tree_structure(jax.eval_shape(
            lambda: model.init(jax.random.key(0), batch["target"][:1], batch["search_0"][:1],
                               batch["target_depth"][:1], batch["search_0_depth"][:1], train=False)))
    )
    rstep = make_train_step(rmodel, GroupedSGD())
    s1, loss1 = jax.jit(step)(state, batch, 1e-4)
    s2, loss2 = jax.jit(rstep)(state, batch, 1e-4)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-5


def test_bf16_train_step_close_to_f32():
    """Mixed-precision train step (train.py --dtype bfloat16): bf16 activation
    stream, f32 params/BN stats/loss/optimizer. Parameters must stay f32 and
    the loss trajectory must track the f32 step."""
    model, state, step, batch = _tiny_setup()
    bmodel = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=BLOCKS,
                                 num_blocks_depth=BLOCKS, dtype=jnp.bfloat16)
    bstep = jax.jit(make_train_step(bmodel, GroupedSGD()))
    fstep = jax.jit(step)

    fs, bs = state, state
    for i in range(3):
        fs, floss = fstep(fs, batch, 1e-4)
        bs, bloss = bstep(bs, batch, 1e-4)
        np.testing.assert_allclose(float(bloss), float(floss), rtol=0.03)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(bs.params))
    assert all(s.dtype == jnp.float32 for s in jax.tree.leaves(bs.batch_stats))
    # it learns: same-batch loss decreases under the bf16 step too
    _, bloss2 = bstep(bs, batch, 1e-4)
    assert float(bloss2) < float(bloss)
