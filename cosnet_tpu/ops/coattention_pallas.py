"""Fused co-attention kernel — flash-style streaming cross-attention on TPU.

The reference materializes the full HW×HW affinity matrix in HBM twice
(row- and column-softmax copies, ``rgbd_segmentation_RAA.py:158-170``): at
480×854 eval resolution that is 2×~170 MB per pair per step and is the
memory-bound core of the model (SURVEY.md §3.3). Here the affinity +
softmax + weighted readback triple is fused into a single Pallas kernel that
streams key/value tiles through VMEM with an online softmax — the HW×HW
matrix never exists in HBM.

Both co-attention directions are instances of one primitive

    flash_xattn(q, k, v) = softmax(q @ kᵀ, axis=-1) @ v      (no scaling)

because with P = A@W (the projected features):
    Z_a = flash_xattn(P, B, B)      # row softmax over frame-b positions
    Z_b = flash_xattn(B, P, A)      # col softmax over frame-a positions

Grid: (batch, q-tiles, k-tiles) with k innermost so Mosaic double-buffers
the streamed k/v DMAs; running max/denominator live in VMEM scratch and the
output block is revisited (finalized on the last k-tile).

The op is differentiable: the VJP recomputes through the einsum reference
(exact same math), which is cheap at training resolution.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, block_k: int, lk: int):
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [Bq, C]
    k = k_ref[0]  # [Bk, C]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, Bk]
    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, NEG_INF)  # mask padded keys

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    # Zero v's out-of-bounds rows: partial edge blocks are implicitly padded
    # with undefined values, and 0-weight × NaN would still poison the acc.
    v = v_ref[0]
    vrow = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    v = jnp.where(vrow < lk, v, 0.0)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_xattn(q, k, v, block_q: int = 512, block_k: int = 512, interpret: bool | None = None):
    """softmax(q @ kᵀ) @ v without materializing the Lq×Lk matrix.

    Args:
      q: [N, Lq, C]; k, v: [N, Lk, C]. No softmax scaling (reference has none).
    Returns: [N, Lq, C] in q's dtype.

    Inputs are passed to the kernel UNPADDED: Pallas implicitly masks partial
    edge blocks (HW = h·w is never tile-aligned, and explicit ``jnp.pad``
    copies cost ~26% of the whole model's step time — measured via xplane
    trace at 480×854 batch 8). Padded key columns are masked to −inf inside
    the kernel; padded query rows only produce discarded output rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, lq, c_in = q.shape
    lk = k.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    bk = min(block_k, _round_up(lk, 8))
    c = c_in
    if c % 128 != 0:
        # Channel padding is rare (C=256 in this model); pay the copy.
        c = _round_up(c_in, 128)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, c - c_in)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, c - c_in)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, c - c_in)))

    grid = (n, pl.cdiv(lq, bq), pl.cdiv(lk, bk))
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk, lk=lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lq, c), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * lq * lk * c,
            bytes_accessed=4 * n * (lq * c + 2 * (grid[1] * lk * c) + lq * c),
            transcendentals=n * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :c_in] if c != c_in else out


@jax.custom_vjp
def coattention_pallas(va, vb, kernel):
    """Fused bidirectional co-attention (see cosnet_tpu/nn/coattention.py)."""
    return _coattention_pallas_fwd_impl(va, vb, kernel)


def _coattention_pallas_fwd_impl(va, vb, kernel):
    n, h, w, c = va.shape
    hb, wb = vb.shape[1:3]
    a = va.reshape(n, h * w, c)
    b = vb.reshape(n, hb * wb, c)
    p = jnp.einsum("nic,cd->nid", a, kernel, preferred_element_type=jnp.float32).astype(a.dtype)
    z_a = flash_xattn(p, b, b)
    z_b = flash_xattn(b, p, a)
    return z_a.reshape(n, h, w, c), z_b.reshape(n, hb, wb, c)


def _fwd(va, vb, kernel):
    out = _coattention_pallas_fwd_impl(va, vb, kernel)
    return out, (va, vb, kernel)


def _bwd(residuals, cotangents):
    from cosnet_tpu.nn.coattention import coattention_einsum

    va, vb, kernel = residuals
    _, vjp = jax.vjp(coattention_einsum, va, vb, kernel)
    return vjp(cotangents)


coattention_pallas.defvjp(_fwd, _bwd)
