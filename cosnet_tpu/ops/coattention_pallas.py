"""Fused co-attention kernels — flash-style streaming cross-attention on TPU.

The reference materializes the full HW×HW affinity matrix in HBM twice
(row- and column-softmax copies, ``rgbd_segmentation_RAA.py:158-170``): at
480×854 eval resolution that is 2×~170 MB per pair per step and is the
memory-bound core of the model (SURVEY.md §3.3). Here the affinity +
softmax + weighted readback triple is fused into Pallas kernels that stream
key/value tiles through VMEM with an online softmax — the HW×HW matrix never
exists in HBM, in either the forward or the backward pass.

Both co-attention directions are instances of one primitive

    flash_xattn(q, k, v) = softmax(q @ kᵀ, axis=-1) @ v      (no scaling)

because with P = A@W (the projected features):
    Z_a = flash_xattn(P, B, B)      # row softmax over frame-b positions
    Z_b = flash_xattn(B, P, A)      # col softmax over frame-a positions

Forward grid: (batch, q-tiles, k-tiles) with k innermost so Mosaic
double-buffers the streamed k/v DMAs; running max/denominator live in VMEM
scratch, the output block is revisited (finalized on the last k-tile), and
the per-row logsumexp L = m + log(l) is emitted as a second output.

Backward (flash-attention-2 style, recompute from (q, k, v, L)):

    Pᵢⱼ = exp(Sᵢⱼ − Lᵢ);   Δᵢ = Σ_c doᵢ_c·oᵢ_c − dLᵢ
    dV = Pᵀ·do;   dS = P ∘ (do·Vᵀ − Δ);   dQ = dS·K;   dK = dSᵀ·Q

run as two streaming kernels (dq over k-tiles; dk/dv over q-tiles), so
training at 480×854 never materializes the affinity either. Supporting a dL
cotangent makes the (o, lse) pair itself differentiable, which is what the
ring context-parallel combine needs (cosnet_tpu/parallel/context_parallel.py).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _row_mask(ref_block, valid, axis0_offset):
    """Zero the out-of-bounds rows of a streamed [rows, C] tile (partial edge
    blocks are implicitly padded with undefined memory; 0-weight × NaN would
    still poison a matmul accumulation)."""
    rows = axis0_offset + jax.lax.broadcasted_iota(jnp.int32, ref_block.shape, 0)
    return jnp.where(rows < valid, ref_block, 0.0)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, block_k: int):
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    lk = valid_ref[0, 0]  # runtime key count (≤ static Lk; ring-CP chunk tails)

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
    # A fully-masked tile (runtime valid below the tile start) keeps m at
    # −inf; compute against a finite stand-in so exp(−inf − −inf) can't NaN.
    m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
    alpha = jnp.exp(m_prev - m_safe)
    p = jnp.exp(s - m_safe)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    v = _row_mask(v_ref[0], lk, kj * block_k)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == nk - 1)
    def _finalize():
        # Rows with zero valid keys finalize to o=0, lse=−inf — exactly the
        # identity element of the online-softmax combine (ring CP).
        l_safe = jnp.where(l_ref[:, :1] == 0.0, 1.0, l_ref[:, :1])
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # lse is stored lane-broadcast ([.., 128]) — TPU block shapes need a
        # 128 last dim (same layout as jax's own TPU flash attention).
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_fwd_impl(q, k, v, valid, block_q: int, block_k: int, interpret: bool):
    """(o, lse) = streaming softmax(q @ kᵀ) @ v. Inputs channel-aligned;
    ``valid`` is the runtime key count as a (1, 1) i32 array."""
    n, lq, c = q.shape
    lk = k.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    bk = min(block_k, _round_up(lk, 8))
    grid = (n, pl.cdiv(lq, bq), pl.cdiv(lk, bk))
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, lq, c), q.dtype),
            jax.ShapeDtypeStruct((n, lq, 128), jnp.float32),
        ],
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
    )(q, k, v, valid)


# ---------------------------------------------------------------------------
# Fused bidirectional forward
# ---------------------------------------------------------------------------
#
# Both co-attention directions share ONE affinity: S = P·Bᵀ, with
#     Z_a[i] = Σ_j softmax_j(S[i,:]) B[j]      (row softmax)
#     Z_b[j] = Σ_i softmax_i(S[:,j]) A[i]      (column softmax)
# so a tile S[i-block, j-block] can be computed once and folded into both
# online softmaxes — 3 matmuls per tile instead of the 4 of two separate
# flash passes (ROADMAP #1). The row direction streams exactly like
# _flash_fwd_kernel. The column direction keeps its FULL accumulator
# resident in VMEM across the whole (i, j) sweep (TPU grids execute
# sequentially, so scratch carries): stored transposed as [C, Lk] with
# keys on lanes, so the per-key online-softmax rescale broadcasts along
# lanes with no per-tile transposes; each Z_b block is transposed once at
# finalization (i == ni−1).


def _flash_bidir_kernel(q_ref, k_ref, va_ref, valid_ref,
                        za_ref, lsea_ref, zb_ref, lseb_ref,
                        acc_ref, m_ref, l_ref, accb_ref, mb_ref, lb_ref,
                        *, block_q: int, block_k: int, lq: int):
    i, j = pl.program_id(1), pl.program_id(2)
    ni, nj = pl.num_programs(1), pl.num_programs(2)
    lk = valid_ref[0, 0]
    ksl = pl.ds(j * block_k, block_k)  # this tile's slice of the column state

    @pl.when(j == 0)
    def _init_row():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(i == 0)
    def _init_col():
        mb_ref[:, ksl] = jnp.full((mb_ref.shape[0], block_k), NEG_INF, jnp.float32)
        lb_ref[:, ksl] = jnp.zeros((lb_ref.shape[0], block_k), jnp.float32)
        accb_ref[:, ksl] = jnp.zeros((accb_ref.shape[0], block_k), jnp.float32)

    q = q_ref[0]  # [Bq, C] (rows ≥ lq are undefined edge padding)
    k = k_ref[0]  # [Bk, C]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Bq, Bk]
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)

    # -- row direction (softmax over keys), identical to _flash_fwd_kernel --
    s_row = jnp.where(col < lk, s, NEG_INF)
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s_row, axis=-1, keepdims=True))
    m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
    alpha = jnp.exp(m_prev - m_safe)
    p = jnp.exp(s_row - m_safe)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    v_row = _row_mask(k, lk, j * block_k)  # direction-A values ARE the keys (B)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_row, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    # -- column direction (softmax over queries), lane-layout statistics ----
    s_col = jnp.where(row < lq, s, NEG_INF)  # undefined q edge rows must not vote
    mb_prev = mb_ref[:1, ksl]  # [1, Bk]
    mb_new = jnp.maximum(mb_prev, jnp.max(s_col, axis=0, keepdims=True))
    mb_safe = jnp.where(mb_new == NEG_INF, 0.0, mb_new)
    alpha_b = jnp.exp(mb_prev - mb_safe)  # [1, Bk] — broadcasts over sublanes
    p_b = jnp.exp(s_col - mb_safe)  # [Bq, Bk]
    lb_new = alpha_b * lb_ref[:1, ksl] + jnp.sum(p_b, axis=0, keepdims=True)
    va_t = _row_mask(va_ref[0], lq, i * block_q)  # [Bq, C] direction-B values (A)
    # accb is [C, Lk]: contract the shared Bq axis; keys stay on lanes.
    accb_ref[:, ksl] = accb_ref[:, ksl] * alpha_b + jax.lax.dot_general(
        va_t, p_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mb_ref[:, ksl] = jnp.broadcast_to(mb_new, (mb_ref.shape[0], block_k))
    lb_ref[:, ksl] = jnp.broadcast_to(lb_new, (lb_ref.shape[0], block_k))

    @pl.when(j == nj - 1)
    def _finalize_row():
        l_safe = jnp.where(l_ref[:, :1] == 0.0, 1.0, l_ref[:, :1])
        za_ref[0] = (acc_ref[:] / l_safe).astype(za_ref.dtype)
        lsea_ref[0] = m_ref[:] + jnp.log(l_ref[:])

    @pl.when(i == ni - 1)
    def _finalize_col():
        lb = lb_ref[:1, ksl]
        lb_safe = jnp.where(lb == 0.0, 1.0, lb)
        zb_ref[0] = jnp.transpose(accb_ref[:, ksl] / lb_safe, (1, 0)).astype(zb_ref.dtype)
        lseb = jnp.transpose(mb_ref[:1, ksl] + jnp.log(lb), (1, 0))  # [Bk, 1]
        lseb_ref[0] = jnp.broadcast_to(lseb, lseb_ref.shape[1:])


def _flash_bidir_fwd_impl(p, b, a, valid, block_q: int, block_k: int, interpret: bool):
    """(z_a, lse_a, z_b, lse_b) with one affinity evaluation per tile.
    p: projected A features [N, Lq, C]; b: counterpart [N, Lk, C];
    a: unprojected A features [N, Lq, C] (direction-B values)."""
    n, lq, c = p.shape
    lk = b.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    bk = min(block_k, _round_up(lk, 8))
    nj = pl.cdiv(lk, bk)
    grid = (n, pl.cdiv(lq, bq), nj)
    return pl.pallas_call(
        functools.partial(_flash_bidir_kernel, block_q=bq, block_k=bk, lq=lq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bq, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, 1), lambda b_, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i, j: (b_, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b_, i, j: (b_, i, 0)),
            # z_b blocks are revisited across i (flushed each step; only the
            # final sweep i == ni−1 writes them, and its flush lands last).
            pl.BlockSpec((1, bk, c), lambda b_, i, j: (b_, j, 0)),
            pl.BlockSpec((1, bk, 128), lambda b_, i, j: (b_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, lq, c), p.dtype),
            jax.ShapeDtypeStruct((n, lq, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, lk, c), b.dtype),
            jax.ShapeDtypeStruct((n, lk, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),       # row acc
            pltpu.VMEM((bq, 128), jnp.float32),     # row m
            pltpu.VMEM((bq, 128), jnp.float32),     # row l
            pltpu.VMEM((c, nj * bk), jnp.float32),  # col acc, transposed
            pltpu.VMEM((8, nj * bk), jnp.float32),  # col m (lane layout)
            pltpu.VMEM((8, nj * bk), jnp.float32),  # col l (lane layout)
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * lq * lk * c,
            bytes_accessed=4 * n * (grid[2] * lq * c + grid[1] * lk * c + lq * c + 2 * (lq + lk) * c),
            transcendentals=2 * n * lq * lk,
        ),
        interpret=interpret,
    )(p, b, a, valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_bidir(p, b, a, valid, block_q, block_k, interpret):
    return _flash_bidir_fwd_impl(p, b, a, valid, block_q, block_k, interpret)


def _flash_bidir_vjp_fwd(p, b, a, valid, block_q, block_k, interpret):
    za, lsea, zb, lseb = _flash_bidir_fwd_impl(p, b, a, valid, block_q, block_k, interpret)
    return (za, lsea, zb, lseb), (p, b, a, valid, za, lsea, zb, lseb)


def _flash_bidir_vjp_bwd(block_q, block_k, interpret, residuals, cotangents):
    """The fused forward is exactly flash(p,b,b) ∥ flash(b,p,a), so the
    backward is the two directions' streaming VJPs summed per operand."""
    p, b, a, valid, za, lsea, zb, lseb = residuals
    dza, dlsea, dzb, dlseb = cotangents
    lq = jnp.reshape(jnp.asarray(p.shape[1], jnp.int32), (1, 1))
    dp1, db_k, db_v = _flash_bwd_impl(p, b, b, valid, za, lsea, dza, dlsea, block_q, block_k, interpret)
    db_q, dp2, da = _flash_bwd_impl(b, p, a, lq, zb, lseb, dzb, dlseb, block_k, block_q, interpret)
    return dp1 + dp2, db_k + db_v + db_q, da, None


_flash_bidir.defvjp(_flash_bidir_vjp_fwd, _flash_bidir_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_xattn_bidir(p, b, a, block_q: int = 256, block_k: int = 512,
                      interpret: bool | None = None):
    """Fused bidirectional cross-attention:
    (softmax(p·bᵀ, axis=-1)·b, softmax(p·bᵀ, axis=0)ᵀ·a) plus both lse
    vectors — one affinity evaluation per tile (module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c_in = p.shape[-1]
    c = _round_up(c_in, 128)
    if c != c_in:
        pad = ((0, 0), (0, 0), (0, c - c_in))
        p, b, a = jnp.pad(p, pad), jnp.pad(b, pad), jnp.pad(a, pad)
    valid = jnp.reshape(jnp.asarray(b.shape[1], jnp.int32), (1, 1))
    # Defaults measured on v5e at the flagship geometry (HW=6527, C=256,
    # batch 8) via benchmarks/kernel_bench.py: (256, 512) beats (512, 256)
    # by ~40% — a shallower q sweep shrinks the column state's flush
    # traffic, and wider k tiles amortize the row-direction rescale.
    za, lsea, zb, lseb = _flash_bidir(p, b, a, valid, block_q, block_k, interpret)
    if c != c_in:
        za, zb = za[:, :, :c_in], zb[:, :, :c_in]
    return za, lsea[:, :, 0], zb, lseb[:, :, 0]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, valid_ref, dq_ref, acc_ref, *, block_k: int):
    kj = pl.program_id(2)
    nk = pl.num_programs(2)
    lk = valid_ref[0, 0]

    @pl.when(kj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = _row_mask(k_ref[0], lk, kj * block_k)
    v = _row_mask(v_ref[0], lk, kj * block_k)
    do = do_ref[0]
    lse = lse_ref[0][:, :1]      # [Bq, 1] (lane-broadcast storage)
    delta = delta_ref[0][:, :1]  # [Bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # lse = −inf marks a query row with zero valid keys (an all-padding
    # ring-CP chunk): its softmax was empty, so P must be 0, not exp(+inf).
    p = jnp.where(lse == NEG_INF, 0.0, jnp.exp(s - jnp.where(lse == NEG_INF, 0.0, lse)))
    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    p = jnp.where(col < lk, p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    ds = jnp.where(col < lk, ds, 0.0)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kj == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, valid_ref, k_ref, v_ref, dk_ref, dv_ref,
                      acck_ref, accv_ref, *, block_q: int, block_k: int, lq: int):
    kj, qi = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)
    lk = valid_ref[0, 0]

    @pl.when(qi == 0)
    def _init():
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accv_ref[:] = jnp.zeros_like(accv_ref)

    q = _row_mask(q_ref[0], lq, qi * block_q)
    do = _row_mask(do_ref[0], lq, qi * block_q)
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0][:, :1]      # [Bq, 1] (lane-broadcast storage)
    delta = delta_ref[0][:, :1]  # [Bq, 1]

    # q-major layout throughout (MXU contracts transposed operands natively;
    # explicit [Bk, Bq] relayouts would be VPU shuffles).
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [Bq, Bk]
    row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # Mask padded query rows, padded key columns (runtime kv_valid — ring-CP
    # chunk tails), and lse = −inf rows (zero valid keys: empty softmax ⇒
    # P = 0, and exp(s − (−inf)) would be +inf → NaN against the zero do).
    live = (row < lq) & (col < lk) & (lse != NEG_INF)
    p = jnp.where(live, jnp.exp(s - jnp.where(lse == NEG_INF, 0.0, lse)), 0.0)
    # dv += pᵀ·do  (contract the shared Bq axis)
    accv_ref[:] = accv_ref[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [Bq, Bk]
    # Select, not multiply: padded-edge query rows carry undefined delta/lse
    # (p = 0 there, but 0 × NaN = NaN would reach every dk row through the
    # q-axis contraction; a select discards the untaken branch instead).
    ds = jnp.where(live, p * (dp - delta), 0.0)
    # dk += dsᵀ·q
    acck_ref[:] = acck_ref[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = acck_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = accv_ref[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, valid, o, lse, do, dlse, block_q: int, block_k: int, interpret: bool):
    n, lq, c = q.shape
    lk = k.shape[1]
    bq = min(block_q, _round_up(lq, 8))
    bk = min(block_k, _round_up(lk, 8))
    # Δ = Σ_c do·o − dL : one cheap fused elementwise+reduce in XLA; stored
    # lane-broadcast like lse (TPU block shapes need a 128 last dim). The
    # C-axis reduction accumulates in f32 even when the residuals are bf16
    # (a bf16 sum of 256 products costs ~2-3 decimal digits on Δ, which
    # enters dS = P∘(dP − Δ) directly).
    delta = (jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
             - jnp.sum(dlse.astype(jnp.float32), axis=-1))  # [n, lq] f32
    delta = jnp.broadcast_to(delta[..., None], (n, lq, 128))

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=bk),
        grid=(n, pl.cdiv(lq, bq), pl.cdiv(lk, bk)),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, c), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lq, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * lq * lk * c,
            bytes_accessed=4 * n * lq * c * 4,
            transcendentals=n * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, valid)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, block_q=bq, block_k=bk, lq=lq),
        grid=(n, pl.cdiv(lk, bk), pl.cdiv(lq, bq)),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, c), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1), lambda b, j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bk, c), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, c), lambda b, j, i: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, c), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, c), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, lk, c), k.dtype),
            jax.ShapeDtypeStruct((n, lk, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n * lq * lk * c,
            bytes_accessed=4 * n * lk * c * 4,
            transcendentals=n * lq * lk,
        ),
        interpret=interpret,
    )(q, do, lse, delta, valid, k, v)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Differentiable primitive
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, valid, block_q, block_k, interpret):
    return _flash_fwd_impl(q, k, v, valid, block_q, block_k, interpret)


def _flash_vjp_fwd(q, k, v, valid, block_q, block_k, interpret):
    o, lse = _flash_fwd_impl(q, k, v, valid, block_q, block_k, interpret)
    return (o, lse), (q, k, v, valid, o, lse)


def _flash_vjp_bwd(block_q, block_k, interpret, residuals, cotangents):
    q, k, v, valid, o, lse = residuals
    do, dlse = cotangents
    dq, dk, dv = _flash_bwd_impl(q, k, v, valid, o, lse, do, dlse, block_q, block_k, interpret)
    return dq, dk, dv, None  # valid (i32) has no cotangent


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "return_lse"))
def flash_xattn(q, k, v, block_q: int = 1024, block_k: int = 512,
                interpret: bool | None = None, return_lse: bool = False,
                kv_valid=None):
    """softmax(q @ kᵀ) @ v without materializing the Lq×Lk matrix — in
    forward *or* backward (flash-style VJP, see module docstring).

    Args:
      q: [N, Lq, C]; k, v: [N, Lk, C]. No softmax scaling (reference has none).
      return_lse: also return the per-row logsumexp [N, Lq] f32 — the online-
        softmax partial that lets ring context parallelism combine per-shard
        results exactly.
      kv_valid: optional traced i32 scalar — only keys/values below this
        index participate (ring-CP chunk tails carry zero padding). Rows that
        end up with zero valid keys return o=0, lse=−inf (the combine
        identity). Defaults to Lk.
    Returns: [N, Lq, C] in q's dtype (and lse when requested).

    Inputs are passed to the kernels UNPADDED: Pallas implicitly masks partial
    edge blocks (HW = h·w is never tile-aligned, and explicit ``jnp.pad``
    copies cost ~26% of the whole model's step time — measured via xplane
    trace at 480×854 batch 8). Padded key columns are masked inside the
    kernels; padded query rows only produce discarded output rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c_in = q.shape[-1]
    c = c_in
    if c % 128 != 0:
        # Channel padding is rare (C=256 in this model); pay the copy. The
        # VJP of pad slices the gradients back automatically.
        c = _round_up(c_in, 128)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, c - c_in)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, c - c_in)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, c - c_in)))
    if kv_valid is None:
        kv_valid = k.shape[1]
    valid = jnp.reshape(jnp.asarray(kv_valid, jnp.int32), (1, 1))
    o, lse = _flash(q, k, v, valid, block_q, block_k, interpret)
    if c != c_in:
        o = o[:, :, :c_in]
    return (o, lse[:, :, 0]) if return_lse else o


# The bidirectional kernel keeps the column direction's accumulator resident
# in VMEM as [C, round_up(Lk, block_k)] f32; past this budget (v5e scoped-vmem
# limit is 16 MB and the tile buffers need headroom) it cannot compile, so the
# dispatch falls back to two streaming passes, which scale to any L with
# O(block) memory. 480×854/os8 (HW=6527, C=256) uses 6.8 MB → fused path.
_BIDIR_COL_STATE_BUDGET_BYTES = 10 * 1024 * 1024


def _bidir_fits(c: int, lk: int, block_k: int = 512) -> bool:
    c_pad = _round_up(c, 128)
    return 4 * c_pad * _round_up(lk, block_k) <= _BIDIR_COL_STATE_BUDGET_BYTES


def coattention_pallas(va, vb, kernel):
    """Fused bidirectional co-attention (see cosnet_tpu/nn/coattention.py).

    Projection einsum + ONE bidirectional flash kernel: the affinity
    S = (A·W)·Bᵀ is evaluated once per tile and folded into both online
    softmaxes (3 matmuls/tile instead of 4 — ROADMAP #1). Autodiff flows
    through the custom VJP (the two directions' streaming backward kernels),
    so the HW×HW affinity is never materialized in HBM, forward or backward.

    Above ``_BIDIR_COL_STATE_BUDGET_BYTES`` tokens×channels the fused kernel's
    VMEM-resident column state no longer fits and the two-pass streaming form
    takes over (4 matmuls/tile but O(block) memory — any resolution).
    """
    n, h, w, c = va.shape
    hb, wb = vb.shape[1:3]
    a = va.reshape(n, h * w, c)
    b = vb.reshape(n, hb * wb, c)
    p = jnp.einsum("nic,cd->nid", a, kernel, preferred_element_type=jnp.float32).astype(a.dtype)
    if _bidir_fits(c, b.shape[1]):
        # Block choice is dtype-dependent (v5e sweep, benchmarks/kernel_bench.py):
        # bf16 halves the q/k tile bytes, so the deeper (512, 512) grid fits
        # VMEM and wins; at f32 it overflows and (256, 512) is best.
        bq = 512 if p.dtype == jnp.bfloat16 else 256
        z_a, _, z_b, _ = flash_xattn_bidir(p, b, a, block_q=bq, block_k=512)
    else:
        z_a = flash_xattn(p, b, b)
        z_b = flash_xattn(b, p, a)
    return z_a.reshape(n, h, w, c), z_b.reshape(n, hb, wb, c)
