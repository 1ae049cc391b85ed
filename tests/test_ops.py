"""Parity tests for the exact-semantics ops vs torch (golden oracle)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from cosnet_tpu.ops.pooling import max_pool_ceil
from cosnet_tpu.ops.resize import resize_bilinear


@pytest.mark.parametrize("in_hw,out_hw", [((8, 10), (64, 80)), ((61, 81), (480, 640)), ((33, 47), (17, 23)), ((1, 1), (7, 9))])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_matches_torch(in_hw, out_hw, align_corners):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=align_corners)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("in_hw", [(240, 320), (241, 321), (120, 160), (64, 64), (61, 81), (7, 9)])
def test_max_pool_ceil_matches_torch(in_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 4), dtype=np.float32)
    got = np.asarray(max_pool_ceil(jnp.asarray(x)))
    pool = torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1, ceil_mode=True)
    want = pool(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
