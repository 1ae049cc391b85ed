"""Device-side augmentation: matches a numpy crop+bilinear-resample+flip oracle."""
import numpy as np

import jax.numpy as jnp

from cosnet_tpu.data.device_augment import augment_batch, draw_augmentation_params


def _numpy_crop_resample(frame, off_y, off_x, crop_h, crop_w, flip):
    """Single-pass bilinear resample of the crop window back to full size."""
    h, w = frame.shape[:2]
    out = np.zeros_like(frame, dtype=np.float32)
    ys = off_y + (np.arange(h) + 0.5) * (crop_h / h) - 0.5
    xs_idx = np.arange(w)
    xs_eff = w - 1 - xs_idx if flip else xs_idx
    xs = off_x + (xs_eff + 0.5) * (crop_w / w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1); wy = ys - y0
    x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1); wx = xs - x0
    f = frame.astype(np.float32)
    for i in range(h):
        top = f[y0[i]] * (1 - wy[i]) + f[y1[i]] * wy[i]
        out[i] = top[x0] * (1 - wx) + top[x1] * wx if top.ndim == 1 else (
            top[x0] * (1 - wx)[:, None] + top[x1] * wx[:, None]
        )
    return out


def test_augment_batch_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((3, 24, 32, 2)).astype(np.float32)
    offsets = np.array([[2.0, 3.0], [0.0, 0.0], [4.0, 1.0]], np.float32)
    crop_ratio = 0.85
    flips = np.array([False, True, False])
    got = np.asarray(augment_batch(jnp.asarray(frames), jnp.asarray(offsets), crop_ratio, jnp.asarray(flips)))
    for b in range(3):
        want = _numpy_crop_resample(
            frames[b], offsets[b, 0], offsets[b, 1], crop_ratio * 24, crop_ratio * 32, flips[b]
        )
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


def test_augment_batch_mask_nearest_binary():
    rng = np.random.default_rng(1)
    masks = (rng.uniform(0, 1, (2, 16, 16)) < 0.4).astype(np.float32)
    offsets = np.array([[1.0, 1.0], [0.0, 2.0]], np.float32)
    got = np.asarray(augment_batch(jnp.asarray(masks), jnp.asarray(offsets), 0.9, jnp.asarray([True, False]), nearest=True))
    assert set(np.unique(got)).issubset({0.0, 1.0})
    assert got.shape == masks.shape


def test_draw_params_sharing_protocol():
    rng = np.random.default_rng(2)
    flip_of_seq = {}
    seqs = ["a", "b", "a", "a"]
    offsets, ratio, flips = draw_augmentation_params(rng, seqs, flip_of_seq, (240, 320))
    assert offsets.shape == (4, 2) and 0.8 <= ratio <= 1.0
    # same sequence -> same flip decision (reference per-seq protocol)
    assert flips[0] == flips[2] == flips[3]
    assert set(flip_of_seq) == {"a", "b"}


def test_identity_when_full_crop_no_flip():
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    got = np.asarray(augment_batch(jnp.asarray(frames), jnp.zeros((1, 2), np.float32), 1.0, jnp.asarray([False])))
    np.testing.assert_allclose(got, frames, rtol=1e-5, atol=1e-6)
