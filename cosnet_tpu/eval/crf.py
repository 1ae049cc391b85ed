"""Dense-CRF mask refinement, TPU-native (ConvCRF-style mean field).

The reference carries a ``--use_crf`` flag and commented-out pydensecrf
imports (``/root/reference/test.py:38-39,76``) — the capability was intended
but never implemented there. Here it is real: fully-connected-CRF mean-field
inference with the standard appearance (bilateral) + smoothness (Gaussian)
pairwise potentials (Krähenbühl & Koltun, NeurIPS 2011), with message
passing truncated to a local window and evaluated as a batched
patch-weighted sum (the ConvCRF formulation, Teichmann & Cipolla 2018).
That truncation is what makes the op TPU-idiomatic: instead of a
host-side permutohedral lattice (pydensecrf's CPU path), each mean-field
iteration is an ``O(N·k²)`` data-parallel stencil that XLA fuses and the
VPU executes — masks never leave the device between the model forward and
the refinement.

Binary (foreground/background) Potts model, matching the segmentation
masks this framework produces:

    E(x) = Σ_i ψ_u(x_i) + Σ_{i<j} μ(x_i, x_j) Σ_m w_m k_m(f_i, f_j)
    k_appearance = exp(-|p_i-p_j|²/2θ_αβ² - |I_i-I_j|²/2θ_β²)
    k_smooth     = exp(-|p_i-p_j|²/2θ_γ²)

Mean-field update (labels {bg, fg}): Q ∝ exp(-ψ_u - Σ_j k(i,j)·w·Q_j(other)).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _patch_stack(x, window: int):
    """[H, W, C] -> [H, W, window², C] neighborhoods (zero-padded edges)."""
    h, w, c = x.shape
    r = window // 2
    xp = jnp.pad(x, ((r, r), (r, r), (0, 0)))
    cols = []
    for dy in range(window):
        for dx in range(window):
            cols.append(jax.lax.dynamic_slice(xp, (dy, dx, 0), (h, w, c)))
    return jnp.stack(cols, axis=2)


@functools.partial(jax.jit, static_argnames=("n_iters", "window"))
def crf_refine(prob, image, n_iters: int = 5, window: int = 9,
               sxy_gauss: float = 3.0, w_gauss: float = 3.0,
               sxy_bilateral: float = 40.0, srgb: float = 13.0,
               w_bilateral: float = 10.0):
    """Refine a foreground probability map against image edges.

    Args:
      prob:  [H, W] float in (0, 1) — the model's sigmoid mask.
      image: [H, W, 3] float guide (any constant offset cancels in the
        color-difference kernel, so mean-subtracted loader output is fine).
    Returns:
      [H, W] refined foreground probability (float32).
    """
    h, w = prob.shape
    prob = prob.astype(jnp.float32)
    eps = 1e-8
    unary_fg = -jnp.log(prob + eps)
    unary_bg = -jnp.log(1.0 - prob + eps)

    # Pairwise kernel per neighborhood offset, shared across iterations.
    r = window // 2
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1].reshape(2, -1).astype(np.float32)
    d2 = jnp.asarray(dy**2 + dx**2)                               # [k²]
    k_gauss = jnp.exp(-d2 / (2.0 * sxy_gauss**2))                 # [k²]
    img = image.astype(jnp.float32)
    nbr = _patch_stack(img, window)                               # [H, W, k², 3]
    color2 = jnp.sum((nbr - img[:, :, None, :]) ** 2, axis=-1)    # [H, W, k²]
    k_bil = jnp.exp(-d2 / (2.0 * sxy_bilateral**2) - color2 / (2.0 * srgb**2))
    center = window * window // 2
    kernel = (w_gauss * k_gauss + w_bilateral * k_bil).at[:, :, center].set(0.0)

    # Zero-padded edges must not receive messages from outside the frame.
    valid = _patch_stack(jnp.ones((h, w, 1), jnp.float32), window)[..., 0]
    kernel = kernel * valid

    q_fg = jax.nn.sigmoid(unary_bg - unary_fg)  # == prob, restated from unaries

    def body(_, q):
        msgs = _patch_stack(q[:, :, None], window)[..., 0]        # [H, W, k²] neighbor Q(fg)
        # Potts compatibility: each label is penalized by the other's mass.
        penalty_bg = jnp.sum(kernel * msgs, axis=-1)              # Σ k·Q(fg) hits bg
        penalty_fg = jnp.sum(kernel * (valid - msgs), axis=-1)    # Σ k·Q(bg) hits fg
        return jax.nn.sigmoid((unary_bg + penalty_bg) - (unary_fg + penalty_fg))

    return jax.lax.fori_loop(0, n_iters, body, q_fg)


def refine_mask_u8(mask_u8, image, **kwargs) -> np.ndarray:
    """uint8 (0-255) mask -> CRF-refined uint8 mask (test.py --use_crf)."""
    prob = jnp.asarray(mask_u8, jnp.float32) / 255.0
    q = crf_refine(prob, jnp.asarray(image), **kwargs)
    return (np.asarray(q) * 255.0).astype(np.uint8)
