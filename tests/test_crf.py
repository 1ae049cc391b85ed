"""CRF refinement (test.py --use_crf): vectorized mean field vs a literal
per-pixel transcription, plus edge-snapping behavior."""
import numpy as np

import jax.numpy as jnp

from cosnet_tpu.eval.crf import crf_refine, refine_mask_u8


def _brute_force(prob, image, n_iters, window, sxy_g, w_g, sxy_b, srgb, w_b):
    h, w = prob.shape
    eps = 1e-8
    u_f = -np.log(prob + eps)
    u_b = -np.log(1.0 - prob + eps)
    q = 1.0 / (1.0 + np.exp(-(u_b - u_f)))
    r = window // 2
    for _ in range(n_iters):
        pen_bg = np.zeros_like(q)
        pen_fg = np.zeros_like(q)
        for i in range(h):
            for j in range(w):
                for di in range(-r, r + 1):
                    for dj in range(-r, r + 1):
                        if di == 0 and dj == 0:
                            continue
                        ni, nj = i + di, j + dj
                        if not (0 <= ni < h and 0 <= nj < w):
                            continue
                        d2 = di * di + dj * dj
                        c2 = np.sum((image[i, j] - image[ni, nj]) ** 2)
                        k = w_g * np.exp(-d2 / (2 * sxy_g**2)) + \
                            w_b * np.exp(-d2 / (2 * sxy_b**2) - c2 / (2 * srgb**2))
                        pen_bg[i, j] += k * q[ni, nj]
                        pen_fg[i, j] += k * (1.0 - q[ni, nj])
        q = 1.0 / (1.0 + np.exp(-((u_b + pen_bg) - (u_f + pen_fg))))
    return q


def test_crf_matches_per_pixel_transcription():
    rng = np.random.default_rng(3)
    h, w = 10, 12
    prob = rng.uniform(0.05, 0.95, (h, w)).astype(np.float32)
    image = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    params = dict(sxy_gauss=2.0, w_gauss=1.5, sxy_bilateral=6.0, srgb=20.0, w_bilateral=2.0)
    ours = np.asarray(crf_refine(jnp.asarray(prob), jnp.asarray(image),
                                 n_iters=3, window=5, **params))
    golden = _brute_force(prob.astype(np.float64), image.astype(np.float64), 3, 5,
                          params["sxy_gauss"], params["w_gauss"],
                          params["sxy_bilateral"], params["srgb"], params["w_bilateral"])
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_crf_snaps_mask_to_color_edge():
    """A blurry/offset mask over a sharp two-tone image should tighten to the
    color boundary and denoise within uniform regions."""
    h, w = 40, 40
    image = np.zeros((h, w, 3), np.float32)
    image[:, 20:] = 200.0  # vertical edge at x=20
    rng = np.random.default_rng(0)
    # mask boundary misplaced at x=24 + salt-and-pepper noise
    prob = np.full((h, w), 0.1, np.float32)
    prob[:, 24:] = 0.9
    noise_idx = rng.integers(0, h * w, 40)
    prob.flat[noise_idx] = 1.0 - prob.flat[noise_idx]

    q = np.asarray(crf_refine(jnp.asarray(prob), jnp.asarray(image), n_iters=5, window=9))
    # inside each color region, the refined mask is decisive and uniform
    assert q[:, :18].mean() < 0.15
    assert q[:, 26:].mean() > 0.85
    # the misplaced band (20..24) moves toward foreground (image says fg side)
    assert q[:, 21:24].mean() > prob[:, 21:24].mean()
    # noise suppressed: no interior pixel disagrees strongly with its region
    assert (q[:, :16] > 0.5).mean() < 0.02
    assert (q[:, 28:] < 0.5).mean() < 0.02


def test_refine_mask_u8_roundtrip():
    rng = np.random.default_rng(1)
    mask = (rng.uniform(0, 1, (16, 16)) * 255).astype(np.uint8)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    out = refine_mask_u8(mask, img, n_iters=2, window=5)
    assert out.dtype == np.uint8 and out.shape == mask.shape
