"""Context-parallel co-attention == single-device co-attention (8 CPU devices)."""
import numpy as np

import jax
import jax.numpy as jnp

from cosnet_tpu.nn.coattention import coattention_einsum
from cosnet_tpu.parallel import data_parallel_mesh
from cosnet_tpu.parallel.context_parallel import coattention_context_parallel


def test_cp_matches_single_device():
    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    rng = np.random.default_rng(0)
    va = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))  # hw=64, /8 tiles
    vb = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)

    want_a, want_b = coattention_einsum(va, vb, kern)
    with mesh:
        got_a, got_b = coattention_context_parallel(va, vb, kern, mesh)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)


def test_cp_fallback_on_ragged_tokens():
    mesh = data_parallel_mesh()
    rng = np.random.default_rng(1)
    va = jnp.asarray(rng.standard_normal((1, 5, 7, 16), dtype=np.float32))  # 35 tokens, not /8
    vb = jnp.asarray(rng.standard_normal((1, 5, 7, 16), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((16, 16), dtype=np.float32) * 0.1)
    want_a, want_b = coattention_einsum(va, vb, kern)
    with mesh:
        got_a, got_b = coattention_context_parallel(va, vb, kern, mesh)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)


def test_ring_matches_single_device_divisible():
    from cosnet_tpu.parallel.context_parallel import coattention_ring

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(2)
    va = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((2, 8, 8, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)
    want_a, want_b = coattention_einsum(va, vb, kern)
    for backend in ("einsum", "pallas"):
        with mesh:
            got_a, got_b = coattention_ring(va, vb, kern, mesh, chunk_backend=backend)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)


def test_ring_ragged_tokens_padded_chunks():
    """35 tokens over 8 chips: chunk=5, last chunk holds 0 valid tokens
    (35 = 7x5) -- exercises the kv_valid masking AND the empty-chunk combine."""
    from cosnet_tpu.parallel.context_parallel import coattention_ring

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(3)
    va = jnp.asarray(rng.standard_normal((1, 5, 7, 32), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((1, 5, 7, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)
    want_a, want_b = coattention_einsum(va, vb, kern)
    for backend in ("einsum", "pallas"):
        with mesh:
            got_a, got_b = coattention_ring(va, vb, kern, mesh, chunk_backend=backend)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), rtol=1e-5, atol=1e-5)


def test_ring_gradients_match_single_device():
    """CP is usable for training: grads through ppermute + online-softmax
    combine + flash VJP == single-device einsum grads."""
    from cosnet_tpu.parallel.context_parallel import coattention_ring

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(4)
    va = jnp.asarray(rng.standard_normal((1, 6, 6, 32), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((1, 6, 6, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)

    def loss_ring(va_, vb_, k_):
        za, zb = coattention_ring(va_, vb_, k_, mesh, chunk_backend="pallas")
        return jnp.sum(za * 0.3 + zb * 0.7)

    def loss_ref(va_, vb_, k_):
        za, zb = coattention_einsum(va_, vb_, k_)
        return jnp.sum(za * 0.3 + zb * 0.7)

    with mesh:
        gr = jax.grad(loss_ring, argnums=(0, 1, 2))(va, vb, kern)
    ge = jax.grad(loss_ref, argnums=(0, 1, 2))(va, vb, kern)
    for a, b in zip(gr, ge):
        # dW sums over all token pairs across 8 ring hops; near-zero elements
        # carry ~1e-4 reassociation noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4)


def test_ring_reachable_from_model_dispatch():
    """backend='ring' on the model routes through enable_context_parallel."""
    from cosnet_tpu.nn.coattention import coattention
    from cosnet_tpu.parallel.context_parallel import (
        disable_context_parallel, enable_context_parallel)

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(5)
    va = jnp.asarray(rng.standard_normal((1, 4, 8, 32), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((1, 4, 8, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)
    want = coattention_einsum(va, vb, kern)
    enable_context_parallel(mesh, "data", chunk_backend="einsum")
    try:
        with mesh:
            got = coattention(va, vb, kern, backend="ring")
    finally:
        disable_context_parallel()
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def test_ring_gradients_with_empty_chunk():
    """The NaN-gradient regression: 35 tokens over 8 chips leaves the last
    ring chunk with ZERO valid tokens (lse = -inf at that hop). The flash
    backward kernels must treat lse = -inf as P = 0 (not exp(+inf)) and the
    online-softmax combine must keep -inf - -inf out of its exp argument
    (where's VJP multiplies the zero cotangent by the untaken branch)."""
    from cosnet_tpu.parallel.context_parallel import coattention_ring

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(6)
    va = jnp.asarray(rng.standard_normal((1, 5, 7, 32), dtype=np.float32))
    vb = jnp.asarray(rng.standard_normal((1, 5, 7, 32), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32) * 0.1)

    def loss_ref(va_, vb_, k_):
        za, zb = coattention_einsum(va_, vb_, k_)
        return jnp.sum(za * 0.3 + zb * 0.7)

    ge = jax.grad(loss_ref, argnums=(0, 1, 2))(va, vb, kern)
    for backend in ("einsum", "pallas"):
        def loss_ring(va_, vb_, k_, backend=backend):
            za, zb = coattention_ring(va_, vb_, k_, mesh, chunk_backend=backend)
            return jnp.sum(za * 0.3 + zb * 0.7)

        with mesh:
            gr = jax.grad(loss_ring, argnums=(0, 1, 2))(va, vb, kern)
        for a, b in zip(gr, ge):
            assert np.isfinite(np.asarray(a)).all(), f"non-finite grads ({backend})"
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4)
