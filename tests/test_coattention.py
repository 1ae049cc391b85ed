"""Co-attention core: einsum reference vs numpy transcription vs Pallas kernel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosnet_tpu.nn.coattention import coattention_einsum
from cosnet_tpu.ops.coattention_pallas import coattention_pallas, flash_xattn


def _numpy_reference(va, vb, w):
    """Literal numpy transcription of rgbd_segmentation_RAA.py:150-176."""
    n, h, wd, c = va.shape
    a_flat = va.reshape(n, h * wd, c).transpose(0, 2, 1)  # [N, C, HW] (torch layout)
    b_flat = vb.reshape(n, h * wd, c).transpose(0, 2, 1)
    a_t = a_flat.transpose(0, 2, 1) @ w.T  # torch Linear: x @ W.T; here w is torch [out,in]
    s = a_t @ b_flat  # [N, HW, HW]

    def softmax(x, axis):
        e = np.exp(x - x.max(axis=axis, keepdims=True))
        return e / e.sum(axis=axis, keepdims=True)

    s_row = softmax(s, axis=1)
    s_col = softmax(s.transpose(0, 2, 1), axis=1)
    z_b = a_flat @ s_row  # [N, C, HW]
    z_a = b_flat @ s_col
    return (
        z_a.transpose(0, 2, 1).reshape(n, h, wd, c),
        z_b.transpose(0, 2, 1).reshape(n, h, wd, c),
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    va = rng.standard_normal((2, 5, 7, 32), dtype=np.float32)
    vb = rng.standard_normal((2, 5, 7, 32), dtype=np.float32)
    w_torch = rng.standard_normal((32, 32), dtype=np.float32) * 0.1  # torch [out,in]
    return va, vb, w_torch


def test_einsum_matches_numpy_transcription(data):
    va, vb, w_torch = data
    want_za, want_zb = _numpy_reference(va, vb, w_torch)
    got_za, got_zb = coattention_einsum(jnp.asarray(va), jnp.asarray(vb), jnp.asarray(w_torch.T))
    np.testing.assert_allclose(np.asarray(got_za), want_za, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_zb), want_zb, rtol=1e-5, atol=1e-5)


def test_pallas_matches_einsum(data):
    va, vb, w_torch = data
    kern = jnp.asarray(w_torch.T)
    want_za, want_zb = coattention_einsum(jnp.asarray(va), jnp.asarray(vb), kern)
    got_za, got_zb = coattention_pallas(jnp.asarray(va), jnp.asarray(vb), kern)
    np.testing.assert_allclose(np.asarray(got_za), np.asarray(want_za), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_zb), np.asarray(want_zb), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lq,lk,c", [(100, 100, 32), (1271, 1271, 64), (37, 530, 128)])
def test_flash_xattn_ragged_shapes(lq, lk, c):
    """Non-tile-aligned lengths (HW = h*w is never a power of two)."""
    rng = np.random.default_rng(lq)
    q = jnp.asarray(rng.standard_normal((1, lq, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, lk, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, lk, c), dtype=np.float32))
    got = np.asarray(flash_xattn(q, k, v, block_q=256, block_k=256))
    want = np.asarray(jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1) @ v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_gradients_match_einsum(data):
    va, vb, w_torch = data
    kern = jnp.asarray(w_torch.T)

    def loss_p(va_, vb_, k_):
        za, zb = coattention_pallas(va_, vb_, k_)
        return jnp.sum(za * 0.3 + zb * 0.7)

    def loss_e(va_, vb_, k_):
        za, zb = coattention_einsum(va_, vb_, k_)
        return jnp.sum(za * 0.3 + zb * 0.7)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(jnp.asarray(va), jnp.asarray(vb), kern)
    ge = jax.grad(loss_e, argnums=(0, 1, 2))(jnp.asarray(va), jnp.asarray(vb), kern)
    for p, e in zip(gp, ge):
        np.testing.assert_allclose(np.asarray(p), np.asarray(e), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("lq,lk", [(300, 300), (530, 37), (257, 513)])
def test_flash_backward_multitile_matches_xla(lq, lk):
    """The flash VJP kernels (streaming dq / dk+dv) vs autodiff through the
    unfused softmax, at lengths spanning several non-aligned tiles."""
    rng = np.random.default_rng(lq + lk)
    c = 128
    q = jnp.asarray(rng.standard_normal((2, lq, c), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, lk, c), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, lk, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((lq, c), dtype=np.float32))

    def loss_flash(q_, k_, v_):
        return jnp.sum(flash_xattn(q_, k_, v_, block_q=128, block_k=128) * w)

    def loss_ref(q_, k_, v_):
        return jnp.sum((jax.nn.softmax(q_ @ k_.transpose(0, 2, 1), axis=-1) @ v_) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        # unscaled C=128 dot products make a sharp softmax; tile-order float
        # accumulation differs from XLA's by ~1e-4 on a few elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-4)


def test_flash_lse_value_and_cotangent():
    """return_lse: value matches logsumexp, and a cotangent flowing into lse
    (the ring-CP combine path) differentiates correctly."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, 200, 128), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 160, 128), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 160, 128), dtype=np.float32))

    _, lse = flash_xattn(q, k, v, block_q=64, block_k=64, return_lse=True)
    want_lse = jax.nn.logsumexp(q @ k.transpose(0, 2, 1), axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), rtol=1e-5, atol=1e-5)

    def loss_flash(q_, k_, v_):
        o, l = flash_xattn(q_, k_, v_, block_q=64, block_k=64, return_lse=True)
        return jnp.sum(o) * 0.1 + jnp.sum(jnp.sin(l))

    def loss_ref(q_, k_, v_):
        s = q_ @ k_.transpose(0, 2, 1)
        o = jax.nn.softmax(s, axis=-1) @ v_
        return jnp.sum(o) * 0.1 + jnp.sum(jnp.sin(jax.nn.logsumexp(s, axis=-1)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("lq,lk", [(64, 64), (100, 83), (300, 517)])
def test_flash_bidir_matches_einsum(lq, lk):
    """Fused bidirectional kernel (one affinity per tile, both online
    softmaxes) == the unfused reference, including ragged edge blocks."""
    from cosnet_tpu.ops.coattention_pallas import flash_xattn_bidir

    rng = np.random.default_rng(0)
    n, c = 2, 128
    p = jnp.asarray(rng.standard_normal((n, lq, c), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((n, lk, c), dtype=np.float32))
    a = jnp.asarray(rng.standard_normal((n, lq, c), dtype=np.float32))
    za, lsea, zb, lseb = flash_xattn_bidir(p, b, a, block_q=64, block_k=64, interpret=True)
    s = jnp.einsum("nic,njc->nij", p, b)
    np.testing.assert_allclose(za, jnp.einsum("nij,njc->nic", jax.nn.softmax(s, 2), b), atol=2e-4)
    np.testing.assert_allclose(zb, jnp.einsum("nij,nic->njc", jax.nn.softmax(s, 1), a), atol=2e-4)
    np.testing.assert_allclose(lsea, jax.nn.logsumexp(s, axis=2), atol=2e-4)
    np.testing.assert_allclose(lseb, jax.nn.logsumexp(s, axis=1), atol=2e-4)


def test_flash_bidir_gradients_match_einsum():
    """The fused op's VJP (two streaming direction backwards, summed per
    operand) == XLA autodiff through the einsum reference; covers the lse
    cotangents the ring-CP combine needs."""
    from cosnet_tpu.ops.coattention_pallas import flash_xattn_bidir

    rng = np.random.default_rng(1)
    n, lq, lk, c = 2, 100, 83, 128
    p, a = (jnp.asarray(rng.standard_normal((n, lq, c), dtype=np.float32)) for _ in range(2))
    b = jnp.asarray(rng.standard_normal((n, lk, c), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((n, lq, c), dtype=np.float32))
    w2 = jnp.asarray(rng.standard_normal((n, lk, c), dtype=np.float32))

    def loss_fused(p, b, a):
        za, lsea, zb, lseb = flash_xattn_bidir(p, b, a, block_q=64, block_k=64, interpret=True)
        return (jnp.sum(za * w1) + jnp.sum(zb * w2)
                + jnp.sum(jnp.sin(lsea)) + jnp.sum(jnp.sin(lseb)))

    def loss_gold(p, b, a):
        s = jnp.einsum("nic,njc->nij", p, b)
        za = jnp.einsum("nij,njc->nic", jax.nn.softmax(s, 2), b)
        zb = jnp.einsum("nij,nic->njc", jax.nn.softmax(s, 1), a)
        return (jnp.sum(za * w1) + jnp.sum(zb * w2)
                + jnp.sum(jnp.sin(jax.nn.logsumexp(s, 2))) + jnp.sum(jnp.sin(jax.nn.logsumexp(s, 1))))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(p, b, a)
    gg = jax.grad(loss_gold, argnums=(0, 1, 2))(p, b, a)
    for x, y in zip(gf, gg):
        assert float(jnp.max(jnp.abs(x - y))) / float(jnp.max(jnp.abs(y))) < 1e-4


def test_bidir_dispatch_budget():
    """The fused bidirectional kernel is only used while its VMEM-resident
    column state fits (v5e scoped-vmem limit); beyond that coattention_pallas
    must take the two-pass streaming form, which scales to any resolution."""
    from cosnet_tpu.ops.coattention_pallas import _bidir_fits

    assert _bidir_fits(256, 61 * 107)        # 480x854/os8: 6.8 MB — fused
    assert not _bidir_fits(256, 120 * 214)   # 960x1708/os8: 26.7 MB — two-pass


def test_coattention_pallas_two_pass_fallback_matches_einsum(monkeypatch):
    """Force the fallback at a small size and check numerical equivalence."""
    from cosnet_tpu.ops import coattention_pallas as mod
    from cosnet_tpu.nn.coattention import coattention_einsum

    rng = np.random.default_rng(7)
    va = jnp.asarray(rng.standard_normal((1, 9, 11, 128), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((1, 9, 11, 128), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((128, 128), dtype=np.float32) * 0.1)
    want = coattention_einsum(va, vb, kern)
    monkeypatch.setattr(mod, "_BIDIR_COL_STATE_BUDGET_BYTES", 1)
    assert not mod._bidir_fits(128, 99)
    got = mod.coattention_pallas(va, vb, kern)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)
