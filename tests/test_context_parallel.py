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
