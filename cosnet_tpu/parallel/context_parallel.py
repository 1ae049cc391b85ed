"""Context-parallel (sequence-parallel) co-attention over the spatial axis.

SURVEY.md §5.7: the scaling-relevant structure is the quadratic affinity
S ∈ [N, HW, HW] (``rgbd_segmentation_RAA.py:160``); "sequence length" here is
spatial tokens × reference frames. The flash kernel removes the materialized
S *within* a chip; this module shards the spatial tokens across the mesh so
resolutions whose working set exceeds one chip still run:

* **ring** (the real memory win): every chip keeps only its HW/d token chunk.
  Counterpart chunks rotate around the ICI ring via ``ppermute``; each hop
  the chip runs the flash kernel on (local queries × visiting chunk) and
  folds the result into its running online-softmax state using the kernel's
  (o, lse) partials:  lseₙ = logaddexp(lse, lseᵢ);  o ← o·e^{lse−lseₙ} +
  oᵢ·e^{lseᵢ−lseₙ}. Peak per-chip activation is O(HW/d) instead of O(HW),
  and compute/communication overlap across hops. Differentiable end-to-end
  (the flash VJP accepts an lse cotangent).

* **ulysses** (all-gather variant): each chip all-gathers the counterpart
  tokens and computes its query rows against the full set. Simpler, but the
  gathered counterpart is O(HW) per chip — kept for small meshes and as a
  golden cross-check.

Both directions of the co-attention pair are computed in the same pass: the
rotating chunk serves as keys/values for the local P-queries (Z_a) and as
queries' key source for the local B-queries (Z_b re-projects the visiting
A-chunk through W locally — a C×C matmul per hop, negligible next to the
attention itself).

Driver wiring: ``test.py --context-parallel ring|ulysses`` (or model
``coattention_backend='ring'``) routes every co-attention in the model here;
the mesh/axis come from :func:`enable_context_parallel`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_CP_CONTEXT: Optional[tuple] = None  # (mesh, axis, chunk_backend)


def enable_context_parallel(mesh: Mesh, axis: str = "data", chunk_backend: str = "pallas"):
    """Install the mesh/axis used by ``coattention_cp`` (model code can't
    thread a Mesh through flax module attributes; the context is trace-time
    static, exactly like the mesh itself)."""
    global _CP_CONTEXT
    _CP_CONTEXT = (mesh, axis, chunk_backend)


def disable_context_parallel():
    global _CP_CONTEXT
    _CP_CONTEXT = None


def coattention_cp(va, vb, kernel, variant: str = "ring"):
    """Dispatch used by nn.coattention for backend 'ring' / 'ulysses'.

    Constraint: ``va.shape == vb.shape``. The ring rotates equal-size token
    chunks, so both feature maps must carry the same token count — true at
    every call site in the model family (the siamese branches share one
    spatial geometry, ``rgbd_segmentation_RAA.py:153-155``); ragged pairs
    would need per-direction chunk grids and are not supported."""
    if _CP_CONTEXT is None:
        raise RuntimeError(
            "context-parallel co-attention requested but enable_context_parallel() "
            "was not called (test.py --context-parallel does this)")
    mesh, axis, chunk_backend = _CP_CONTEXT
    if variant == "ring":
        return coattention_ring(va, vb, kernel, mesh, axis, chunk_backend=chunk_backend)
    return coattention_context_parallel(va, vb, kernel, mesh, axis)


def _chunk_attn(q, k, v, valid, chunk_backend: str):
    """(o, lse) of softmax(q·kᵀ)·v over the first ``valid`` keys."""
    if chunk_backend == "pallas":
        from cosnet_tpu.ops.coattention_pallas import flash_xattn

        return flash_xattn(q, k, v, return_lse=True, kv_valid=valid)
    # einsum golden path (tests / cross-check)
    s = jnp.einsum("nic,njc->nij", q, k)
    mask = jnp.arange(k.shape[1])[None, None, :] < valid
    s = jnp.where(mask, s, -jnp.inf)
    lse = jax.nn.logsumexp(s, axis=2)
    lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)
    p = jnp.where(mask, jnp.exp(s - lse_safe[..., None]), 0.0)
    return jnp.einsum("nij,njc->nic", p, v), lse


def _combine(o, lse, o_i, lse_i):
    """Fold one chunk's (o, lse) into the running online-softmax state.

    The −inf−(−inf) case (both states empty) is kept out of the exp argument
    itself, not just the result: ``where(empty, 0, exp(NaN))`` would leak NaN
    through where's VJP (cotangent × NaN on the untaken branch), so the inner
    where pins the argument to a finite value first."""
    lse_new = jnp.logaddexp(lse, lse_i)
    empty = jnp.isneginf(lse_new)
    w0 = jnp.where(empty, 0.0, jnp.exp(jnp.where(empty, 0.0, lse - lse_new)))
    w1 = jnp.where(empty, 0.0, jnp.exp(jnp.where(empty, 0.0, lse_i - lse_new)))
    return o * w0[..., None] + o_i * w1[..., None], lse_new


def coattention_ring(va, vb, kernel, mesh: Mesh, axis: str = "data", chunk_backend: str = "pallas"):
    """Bidirectional co-attention with spatial tokens sharded over ``axis``
    and counterpart chunks rotating around the ring. Semantics identical to
    cosnet_tpu.nn.coattention.coattention for any HW (chunk tails are
    zero-padded and masked via the kernel's runtime ``kv_valid``)."""
    from jax.experimental.shard_map import shard_map

    n, h, w, c = va.shape
    assert vb.shape == va.shape, (va.shape, vb.shape)
    hw = h * w
    d = mesh.shape[axis]
    if d == 1:
        from cosnet_tpu.nn.coattention import coattention_einsum

        return coattention_einsum(va, vb, kernel)
    chunk = -(-hw // d)
    hw_pad = chunk * d
    a = va.reshape(n, hw, c)
    b = vb.reshape(n, hw, c)
    if hw_pad != hw:
        a = jnp.pad(a, ((0, 0), (0, hw_pad - hw), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, hw_pad - hw), (0, 0)))

    def shard_fn(a_s, b_s, kern):
        my = jax.lax.axis_index(axis)
        p_local = jnp.einsum("nic,cd->nid", a_s, kern, preferred_element_type=jnp.float32).astype(a_s.dtype)
        perm = [(i, (i + 1) % d) for i in range(d)]
        o_a = jnp.zeros_like(a_s)
        o_b = jnp.zeros_like(b_s)
        lse_a = jnp.full(a_s.shape[:2], -jnp.inf, jnp.float32)
        lse_b = jnp.full(b_s.shape[:2], -jnp.inf, jnp.float32)
        a_rot, b_rot = a_s, b_s
        for step in range(d):
            src = (my - step) % d  # which global chunk is visiting
            valid = jnp.maximum(jnp.minimum(hw - src * chunk, chunk), 0).astype(jnp.int32)
            # Z_a rows for local P-queries vs the visiting B chunk
            oa_i, la_i = _chunk_attn(p_local, b_rot, b_rot, valid, chunk_backend)
            # Z_b rows for local B-queries vs the visiting A chunk (as keys,
            # projected through W locally) with the raw A chunk as values
            p_rot = jnp.einsum("nic,cd->nid", a_rot, kern, preferred_element_type=jnp.float32).astype(a_rot.dtype)
            ob_i, lb_i = _chunk_attn(b_s, p_rot, a_rot, valid, chunk_backend)
            o_a, lse_a = _combine(o_a, lse_a, oa_i, la_i)
            o_b, lse_b = _combine(o_b, lse_b, ob_i, lb_i)
            if step < d - 1:
                a_rot = jax.lax.ppermute(a_rot, axis, perm)
                b_rot = jax.lax.ppermute(b_rot, axis, perm)
        return o_a, o_b

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None), P(None, None)),
        out_specs=(P(None, axis, None), P(None, axis, None)),
        check_rep=False,
    )
    z_a, z_b = fn(a, b, kernel)
    z_a = z_a[:, :hw].reshape(n, h, w, c)
    z_b = z_b[:, :hw].reshape(n, h, w, c)
    return z_a, z_b


def coattention_context_parallel(va, vb, kernel, mesh: Mesh, axis: str = "data", backend: str = "einsum"):
    """Ulysses-style CP: query rows sharded, counterpart all-gathered.

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
