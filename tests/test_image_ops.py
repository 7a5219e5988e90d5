"""Tests for image filter ops: closed-form + torch-built references."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from simplerecon_tpu.ops import image as image_ops


def _torch_depthwise(x_bchw, k_hw, pad_mode, stride=1):
    c = x_bchw.shape[1]
    k = torch.from_numpy(np.tile(k_hw[None, None], (c, 1, 1, 1)))
    p = k_hw.shape[0] // 2
    xp = F.pad(torch.from_numpy(x_bchw), (p, p, p, p), mode=pad_mode)
    return F.conv2d(xp, k, stride=stride, groups=c).numpy()


def test_gaussian_blur_preserves_constant(rng):
    x = np.full((1, 6, 8, 2), 3.5, dtype=np.float32)
    y = np.asarray(image_ops.gaussian_blur(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_gaussian_blur_matches_torch_reference(rng):
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    k = image_ops._gaussian_kernel_np(5, 2.0)
    want = _torch_depthwise(x.transpose(0, 3, 1, 2), k, "reflect")
    got = np.asarray(image_ops.gaussian_blur(jnp.asarray(x), 5, 2.0))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_spatial_gradient_of_linear_ramp(rng):
    # f(x, y) = 2x -> df/dx = 2, df/dy = 0 (normalized Sobel)
    h, w = 8, 10
    xs = np.arange(w, dtype=np.float32)
    x = np.tile(2.0 * xs[None, :], (h, 1))[None, :, :, None]
    g = np.asarray(image_ops.spatial_gradient(jnp.asarray(x)))
    inner = g[0, 2:-2, 2:-2, 0]
    np.testing.assert_allclose(inner[..., 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(inner[..., 1], 0.0, atol=1e-5)


def test_blur_pool_shape_and_constant(rng):
    x = np.full((1, 12, 16, 3), 2.0, dtype=np.float32)
    y = np.asarray(image_ops.blur_pool(jnp.asarray(x)))
    assert y.shape == (1, 6, 8, 3)
    np.testing.assert_allclose(y, 2.0, atol=1e-5)


def test_blur_pool_matches_torch_reference(rng):
    x = rng.randn(2, 8, 12, 4).astype(np.float32)
    want = _torch_depthwise(x.transpose(0, 3, 1, 2), image_ops._BINOMIAL3,
                            "reflect", stride=2)
    got = np.asarray(image_ops.blur_pool(jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_pyrdown_levels(rng):
    x = rng.randn(1, 32, 32, 1).astype(np.float32)
    pyr = image_ops.pyrdown(jnp.asarray(x), 4)
    assert [p.shape[1] for p in pyr] == [32, 16, 8, 4]


def test_imagenet_normalize_roundtrip(rng):
    x = rng.rand(2, 4, 4, 3).astype(np.float32)
    y = image_ops.reverse_imagenet_normalize(
        image_ops.imagenet_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)
