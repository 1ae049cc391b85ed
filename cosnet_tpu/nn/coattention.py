"""Channel co-attention core — the hot op (SURVEY.md §2 "Co-attention core").

Reference semantics (``rgbd_segmentation_RAA.py:150-191``): with flattened
features A = V_a, B = V_b in [N, HW, C] and a bias-free C×C projection W,

    S[i, j]   = (A[i] @ W) · B[j]                       # affinity, [N, HWa, HWb]
    Z_a[i]    = Σ_j softmax_j(S[i, :]) B[j]             # row softmax  (torch: softmax(Sᵀ, dim=1) then bmm)
    Z_b[j]    = Σ_i softmax_i(S[:, j]) A[i]             # col softmax  (torch: softmax(S, dim=1) then bmm)

i.e. **bidirectional cross-attention sharing one affinity matrix**. That
observation is the TPU design: each direction is a standard
softmax(q·kᵀ)·v, so the fused path runs a flash-style streaming Pallas
kernel twice (never materializing the HW×HW matrix in HBM):

    Z_a = flash_xattn(q=A@W, k=B, v=B)
    Z_b = flash_xattn(q=B, k=A@W, v=A)

The unfused einsum path below is the golden reference (validated against a
torch transcription in tests) and the default under training, where XLA
handles the small train-resolution affinity well.
"""
import jax
import jax.numpy as jnp


def coattention_einsum(va, vb, kernel):
    """Unfused reference implementation.

    Args:
      va, vb: [N, h, w, C] NHWC feature maps (siamese pair).
      kernel: [C, C] projection such that P = A @ kernel (torch ``linear_e``
        weight transposed).
    Returns:
      (z_a, z_b): [N, h, w, C] attention summaries.
    """
    n, h, w, c = va.shape
    hb, wb = vb.shape[1:3]
    a = va.reshape(n, h * w, c)
    b = vb.reshape(n, hb * wb, c)
    p = a @ kernel  # [N, HWa, C]
    s = jnp.einsum("nic,njc->nij", p, b)  # affinity [N, HWa, HWb]
    z_a = jnp.einsum("nij,njc->nic", jax.nn.softmax(s, axis=2), b)
    z_b = jnp.einsum("nij,nic->njc", jax.nn.softmax(s, axis=1), a)
    return z_a.reshape(n, h, w, c), z_b.reshape(n, hb, wb, c)


def coattention(va, vb, kernel, backend: str = "einsum"):
    """Dispatch: einsum reference, fused Pallas kernel, or a context-parallel
    variant ('ring' / 'ulysses' — tokens sharded over the mesh installed by
    cosnet_tpu.parallel.context_parallel.enable_context_parallel)."""
    # Params are stored f32 regardless of compute dtype (flax param_dtype
    # convention — checkpoints are dtype-independent); compute follows the
    # activations, as nn.Conv's promote_dtype does.
    kernel = kernel.astype(va.dtype)
    if backend == "einsum":
        return coattention_einsum(va, vb, kernel)
    if backend == "pallas":
        from cosnet_tpu.ops.coattention_pallas import coattention_pallas

        return coattention_pallas(va, vb, kernel)
    if backend in ("ring", "ulysses"):
        from cosnet_tpu.parallel.context_parallel import coattention_cp

        return coattention_cp(va, vb, kernel, variant=backend)
    raise ValueError(f"unknown coattention backend: {backend}")
