"""Context-parallel (sequence-parallel) co-attention over the spatial axis.

SURVEY.md §5.7: the scaling-relevant structure is the quadratic affinity
S ∈ [N, HW, HW]; "sequence length" here is spatial tokens × reference
frames. The flash kernel already removes the materialized S *within* a chip;
this module shards the *query* rows of both directions across the mesh so
each chip holds HW/n query tokens and computes softmax(q·kᵀ)·v against the
full (all-gathered) counterpart — the Ulysses-style CP layout. A ring
variant that streams k/v over ICI with running softmax stats is the
documented next step (requires the kernel to expose unnormalized
accumulators).

Used for very high resolutions where even one direction's flash pass
exceeds a single chip's comfortable working set, and for sharding the
multi-reference ensemble across chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def coattention_context_parallel(va, vb, kernel, mesh: Mesh, axis: str = "data", backend: str = "einsum"):
    """Bidirectional co-attention with spatial tokens sharded over ``axis``.

    va, vb: [N, h, w, C]. Tokens (h·w) must divide the mesh axis size.
    Semantics identical to cosnet_tpu.nn.coattention.coattention.
    """
    from cosnet_tpu.nn.coattention import coattention_einsum

    n, h, w, c = va.shape
    hw = h * w
    n_shards = mesh.shape[axis]
    if hw % n_shards != 0:
        # Fall back to the single-device path when tokens don't tile.
        return coattention_einsum(va, vb, kernel)

    a = va.reshape(n, hw, c)
    b = vb.reshape(n, hw, c)

    def shard_fn(a_shard, b_shard, kern):
        # a_shard, b_shard: [N, HW/n, C] per chip.
        b_full = jax.lax.all_gather(b_shard, axis, axis=1, tiled=True)  # [N, HW, C]
        a_full = jax.lax.all_gather(a_shard, axis, axis=1, tiled=True)
        p_shard = jnp.einsum("nic,cd->nid", a_shard, kern)  # queries of dir A
        # Z_a rows for this chip's query tokens (softmax over full b tokens)
        s_a = jnp.einsum("nic,njc->nij", p_shard, b_full)
        z_a = jnp.einsum("nij,njc->nic", jax.nn.softmax(s_a, axis=2), b_full)
        # Z_b rows for this chip's b tokens (softmax over full a tokens)
        p_full = jnp.einsum("nic,cd->nid", a_full, kern)
        s_b = jnp.einsum("njc,nic->nji", b_shard, p_full)  # [N, HWb/n, HWa]
        z_b = jnp.einsum("nji,nic->njc", jax.nn.softmax(s_b, axis=2), a_full)
        return z_a, z_b

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None), P(None, None)),
        out_specs=(P(None, axis, None), P(None, axis, None)),
    )
    z_a, z_b = fn(a, b, kernel)
    return z_a.reshape(n, h, w, c), z_b.reshape(n, h, w, c)
