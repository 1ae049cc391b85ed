"""Device-side augmentation: host-vs-device equivalence with the cv2 path.

The device path composes the reference's crop→scale→flip chain
(``dataloaders/utils.py:18-46``, order at ``sbm_rgbd_loader.py:713-720``)
plus the static-shape resize into one interpolation matrix per axis; these
tests drive the *actual host implementation* (``augment_frame``, cv2) with
identical RNG decisions and require the device output to match.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cosnet_tpu.data.augment import augment_frame
from cosnet_tpu.data.device_augment import augment_batch, draw_augmentation_params


def _host_chain(img, crop_ratio, scale_ratio, offset, flip, nearest=False):
    static = img.shape[:2]
    out, _ = augment_frame(
        img, crop_ratio, scale_ratio, 1.0 if flip else 0.0, offset,
        rng=None, nearest=nearest, static_hw=static,
    )
    return out


@pytest.mark.parametrize("crop_ratio,scale_ratio", [(0.85, 1.0), (0.8, 0.7), (0.93, 1.3), (1.0, 1.0)])
def test_device_matches_host_linear(crop_ratio, scale_ratio):
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((3, 48, 64, 3)).astype(np.float32) * 50
    # valid crop offsets: 0 <= off < S - int(c*S) (draw_augmentation_params bound)
    my, mx = max(48 - int(crop_ratio * 48) - 1, 0), max(64 - int(crop_ratio * 64) - 1, 0)
    offsets = np.array([[min(2, my), min(3, mx)], [0, 0], [min(5, my), min(1, mx)]], np.float32)
    flips = np.array([False, True, False])

    got = np.asarray(augment_batch(
        jnp.asarray(frames), jnp.asarray(offsets), crop_ratio, scale_ratio, jnp.asarray(flips)))
    for b in range(3):
        want = _host_chain(frames[b], crop_ratio, scale_ratio,
                           (int(offsets[b, 0]), int(offsets[b, 1])), flips[b])
        np.testing.assert_allclose(got[b], want, rtol=2e-3, atol=5e-3)


@pytest.mark.parametrize("crop_ratio,scale_ratio", [(0.85, 1.0), (0.8, 0.75), (0.9, 1.25)])
def test_device_matches_host_nearest_masks(crop_ratio, scale_ratio):
    rng = np.random.default_rng(1)
    masks = (rng.uniform(0, 1, (2, 40, 56)) < 0.4).astype(np.uint8)
    offsets = np.array([[1, 1], [0, 2]], np.float32)
    flips = np.array([True, False])

    got = np.asarray(augment_batch(
        jnp.asarray(masks.astype(np.float32)), jnp.asarray(offsets),
        crop_ratio, scale_ratio, jnp.asarray(flips), nearest=True))
    assert set(np.unique(got)).issubset({0.0, 1.0})
    for b in range(2):
        want = _host_chain(masks[b], crop_ratio, scale_ratio,
                           (int(offsets[b, 0]), int(offsets[b, 1])), flips[b], nearest=True)
        # cv2's nearest index uses double ``dst*(src/dst)``; ours is the exact
        # rational — they can disagree only on exact-integer boundaries.
        mismatch = np.mean(got[b] != want)
        assert mismatch <= 0.01, mismatch


def test_device_matches_host_depth_singlechannel():
    rng = np.random.default_rng(2)
    depth = rng.uniform(0, 255, (2, 32, 44, 1)).astype(np.float32)
    offsets = np.array([[3, 2], [1, 4]], np.float32)
    flips = np.array([False, True])
    got = np.asarray(augment_batch(jnp.asarray(depth), jnp.asarray(offsets), 0.82, 1.1, jnp.asarray(flips)))
    for b in range(2):
        want = _host_chain(depth[b, :, :, 0], 0.82, 1.1,
                           (int(offsets[b, 0]), int(offsets[b, 1])), flips[b])
        np.testing.assert_allclose(got[b, :, :, 0], want, rtol=2e-3, atol=5e-3)


def test_draw_params_sharing_protocol():
    rng = np.random.default_rng(2)
    flip_of_seq = {}
    seqs = ["a", "b", "a", "a"]
    offsets, crop, scale, flips = draw_augmentation_params(rng, seqs, flip_of_seq, (240, 320))
    assert offsets.shape == (4, 2) and 0.8 <= crop <= 1.0 and 0.7 <= scale <= 1.3
    # same sequence -> same flip decision (reference per-seq protocol)
    assert flips[0] == flips[2] == flips[3]
    # ratios shared across modality groups when passed back in
    _, crop2, scale2, _ = draw_augmentation_params(rng, seqs, flip_of_seq, (240, 320), ratios=(crop, scale))
    assert crop2 == crop and scale2 == scale
