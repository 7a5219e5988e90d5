"""Parity tests: grid_sample / resize vs torch CPU (the reference's ops)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from simplerecon_tpu.ops import sampling


def _torch_grid_sample(img_bchw, grid_bhw2, mode):
    with torch.no_grad():
        return F.grid_sample(torch.from_numpy(img_bchw),
                             torch.from_numpy(grid_bhw2),
                             mode=mode, padding_mode="zeros",
                             align_corners=False).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode):
    b, c, h, w = 2, 5, 9, 13
    ho, wo = 7, 11
    img = rng.randn(b, c, h, w).astype(np.float32)
    # grid spans beyond [-1, 1] to exercise zeros padding
    grid = rng.uniform(-1.4, 1.4, (b, ho, wo, 2)).astype(np.float32)

    want = _torch_grid_sample(img, grid, mode)  # (b, c, ho, wo)

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    got = np.asarray(sampling.grid_sample_2d(img_nhwc, jnp.asarray(grid),
                                             mode=mode))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-6)


def test_grid_sample_exact_centers(rng):
    """Sampling at exact pixel centers returns the pixel values."""
    b, c, h, w = 1, 3, 4, 6
    img = rng.randn(b, c, h, w).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = (2 * (xs + 0.5) / w - 1).astype(np.float32)
    gy = (2 * (ys + 0.5) / h - 1).astype(np.float32)
    grid = np.stack([gx, gy], axis=-1)[None]
    got = np.asarray(sampling.grid_sample_2d(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), img, atol=1e-6)


@pytest.mark.parametrize("shape_out", [(8, 12), (17, 23), (3, 5)])
def test_resize_nearest_matches_torch(rng, shape_out):
    img = rng.randn(2, 3, 6, 10).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=shape_out,
                         mode="nearest").numpy()
    got = np.asarray(sampling.resize_nearest(
        jnp.asarray(img.transpose(0, 2, 3, 1)), *shape_out))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=0)


@pytest.mark.parametrize("shape_out", [(12, 20), (5, 7), (13, 9)])
def test_resize_bilinear_matches_torch(rng, shape_out):
    img = rng.randn(2, 3, 6, 10).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), size=shape_out,
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(sampling.resize_bilinear(
        jnp.asarray(img.transpose(0, 2, 3, 1)), *shape_out))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-6)


def test_upsample2x_matches_torch(rng):
    img = rng.randn(1, 4, 8, 8).astype(np.float32)
    want = F.interpolate(torch.from_numpy(img), scale_factor=2,
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(sampling.upsample2x(
        jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-6)


@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_resize_bilinear_2x_fast_path_bitexact(rng, dtype):
    """The gather-free 2x interleave fast path must be bit-identical to
    the general gather formulation (same expressions, reordered ops)."""
    img = jnp.asarray(rng.randn(2, 5, 7, 3), dtype=jnp.dtype(dtype))
    fast = sampling.resize_bilinear(img, 10, 14)
    # force the general path by resizing H and W in two odd-target steps
    # is not equivalent; instead evaluate the gather formulation directly.
    h, w = 5, 7

    def axis_weights(out_n, in_n):
        coord = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) \
            * (in_n / out_n) - 0.5
        coord = jnp.clip(coord, 0.0, in_n - 1.0)
        i0 = jnp.floor(coord).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        return i0, i1, (coord - i0.astype(jnp.float32)).astype(img.dtype)

    y0, y1, wy = axis_weights(10, h)
    x0, x1, wx = axis_weights(14, w)
    top, bot = img[:, y0], img[:, y1]
    rows = top + (bot - top) * wy[None, :, None, None]
    left, right = rows[:, :, x0], rows[:, :, x1]
    ref = left + (right - left) * wx[None, None, :, None]
    assert fast.dtype == ref.dtype
    assert bool(jnp.all(fast == ref))


def test_sample_nearest_matmul_matches_gather(rng):
    """The one-hot MXU nearest sampler must equal grid_sample
    (mode='nearest') bit-for-bit, including out-of-range zeros and
    round-half-to-even ties."""
    img = jnp.asarray(rng.randn(2, 9, 13, 3).astype(np.float32))
    grid = rng.uniform(-1.4, 1.4, (2, 57, 2)).astype(np.float32)
    # exact .5 index-space ties to exercise round-half-to-even
    grid[0, :4, 0] = (2 * (np.array([0.5, 1.5, 2.5, 3.5]) + 0.5)
                      - 13) / 13
    grid = jnp.asarray(grid)
    want = sampling.grid_sample(img, grid, mode="nearest")
    got = sampling.sample_nearest_matmul(img, grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
