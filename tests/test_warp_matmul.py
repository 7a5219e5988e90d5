"""Parity of the MXU (two-hot matmul) plane-sweep warp vs the gather
formulation. The matmul warp computes the exact same bilinear taps with
zeros padding — on TPU it replaces ~200 ms of row-latency-bound gathers
with ~2 TFLOP of dense matmuls (~6x faster end to end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplerecon_tpu.ops import cost_volume as cv_ops


def _geometry(b, k, h, w):
    def rot(t):
        R = np.eye(4, dtype=np.float32)
        R[0, 0] = np.cos(t)
        R[0, 2] = np.sin(t)
        R[2, 0] = -np.sin(t)
        R[2, 2] = np.cos(t)
        return R

    ex = np.stack([rot(0.03 * i) for i in range(k)])[None]
    ex = np.broadcast_to(ex, (b, k, 4, 4)).copy()
    ex[..., 0, 3] = np.linspace(-0.25, 0.25, k)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 60.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    src_K = np.broadcast_to(K, (b, k, 4, 4)).copy()
    invK = np.broadcast_to(np.linalg.inv(K), (b, 4, 4)).copy()
    return ex, src_K, invK


@pytest.mark.parametrize("band_axis", ["x", "y"])
def test_matmul_warp_matches_gather_warp(band_axis):
    b, k, h, w, c, d = 2, 3, 48, 64, 8, 16
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)

    with jax.default_matmul_precision("highest"):
        wg = cv_ops.sweep_warp(src, ex, src_K, invK, planes,
                               backend="gather")
        wm = cv_ops.sweep_warp_matmul(src, ex, src_K, invK, planes,
                                      band_axis=band_axis)

    np.testing.assert_allclose(np.asarray(wm.sampled_bkdNc),
                               np.asarray(wg.sampled_bkdNc),
                               rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(wm.mask_bkdN == wg.mask_bkdN))
    np.testing.assert_allclose(np.asarray(wm.depths_bkdN),
                               np.asarray(wg.depths_bkdN))


def test_matmul_warp_zero_padding_out_of_bounds():
    """Samples that fall outside the source image must come back zero
    (grid_sample padding_mode='zeros' semantics)."""
    b, k, h, w, c, d = 1, 1, 16, 16, 4, 4
    src = jnp.ones((b, k, h, w, c), jnp.float32)
    ex = np.eye(4, dtype=np.float32)[None, None].copy()
    ex[..., 0, 3] = 100.0  # push projections far off-image
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 20.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    src_K = K[None, None].copy()
    invK = np.linalg.inv(K)[None]
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 2.0)

    wm = cv_ops.sweep_warp_matmul(src, ex, src_K, invK, planes)
    assert float(jnp.abs(wm.sampled_bkdNc).max()) == 0.0


def test_matmul_warp_band_sizes_all_exact():
    """Column banding is a pure optimization: every band size (including
    ones too small for the motion, which must trigger the exact
    full-width fallback) yields grid_sample-identical samples."""
    b, k, h, w, c, d = 1, 2, 32, 64, 8, 8
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    ex[..., 0, 3] = np.linspace(-1.5, 1.5, k)  # big baseline: wide spread
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)

    with jax.default_matmul_precision("highest"):
        ref = cv_ops.sweep_warp(src, ex, src_K, invK, planes,
                                backend="gather")
        for axis in ("x", "y"):
            for band in (8, 16, 24, h if axis == "y" else w):
                got = cv_ops.sweep_warp_matmul(src, ex, src_K, invK,
                                               planes, x_band=band,
                                               band_axis=axis)
                np.testing.assert_allclose(
                    np.asarray(got.sampled_bkdNc),
                    np.asarray(ref.sampled_bkdNc),
                    rtol=1e-4, atol=1e-4,
                    err_msg=f"axis={axis} band={band}")


def test_matmul_warp_mixed_batch_tiers_exact():
    """Tiering is per batch element: a batch mixing a gentle pose (fits
    the narrow band) with a violent one (must fall back) stays exact for
    both elements."""
    b, k, h, w, c, d = 2, 2, 32, 64, 8, 8
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    ex[1, :, 0, 3] = np.linspace(-2.0, 2.0, k)  # element 1: wide spread
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)

    with jax.default_matmul_precision("highest"):
        ref = cv_ops.sweep_warp(src, ex, src_K, invK, planes,
                                backend="gather")
        got = cv_ops.sweep_warp_matmul(src, ex, src_K, invK, planes,
                                       x_band=16)
    np.testing.assert_allclose(np.asarray(got.sampled_bkdNc),
                               np.asarray(ref.sampled_bkdNc),
                               rtol=1e-4, atol=1e-4)


def test_matmul_warp_tile_sizes_all_exact():
    """Tile decomposition must be order-exact for non-divisor-friendly
    tile requests (helper rounds down to a divisor)."""
    b, k, h, w, c, d = 1, 2, 24, 40, 4, 4
    rng = np.random.RandomState(4)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)

    with jax.default_matmul_precision("highest"):
        ref = cv_ops.sweep_warp(src, ex, src_K, invK, planes,
                                backend="gather")
        for th, tw in ((8, 8), (32, 32), (5, 13)):
            got = cv_ops.sweep_warp_matmul(src, ex, src_K, invK, planes,
                                           tile_h=th, tile_w=tw)
            np.testing.assert_allclose(np.asarray(got.sampled_bkdNc),
                                       np.asarray(ref.sampled_bkdNc),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"tile={th}x{tw}")


def _mlp_setup(rng, k, c, hidden=24):
    from simplerecon_tpu.models.cost_volume import mlp_input_channels
    c_in = mlp_input_channels(c, k)
    w0 = jnp.asarray(rng.randn(c_in, hidden) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.randn(hidden) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(hidden, hidden) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(hidden) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(hidden, 1) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)
    return ((w0, b0), (w1, b1), (w2, b2))


@pytest.mark.parametrize("custom", [True, "pallas", "pallas_bwd"])
@pytest.mark.parametrize("band_axis", ["x", "y"])
@pytest.mark.parametrize("wide_baseline", [False, True])
def test_sweep_mlp_volume_custom_vjp_grad_parity(band_axis,
                                                 wide_baseline, custom):
    """The hand-written VJP must reproduce autodiff's gradients for
    src features, current features, and every MLP parameter — on both
    the narrow-band tier and (wide_baseline) the exact full fallback.
    custom="pallas" additionally routes the primal through the banded
    Pallas kernel (interpret mode here) — same value, same grads."""
    b, k, h, w, c, d = 2, 3, 24, 32, 8, 6
    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    cur = jnp.asarray(rng.randn(b, h * w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    if wide_baseline:
        ex[..., 0, 3] = np.linspace(-2.0, 2.0, k)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)
    penalty = jnp.asarray(rng.rand(b, k, 3), jnp.float32)
    loc = jnp.asarray(rng.randn(b, k, 3) * 0.1, jnp.float32)
    mlp = _mlp_setup(rng, k, c)
    # fixed cotangent weighting so every output position matters
    gw = jnp.asarray(rng.randn(b, d, h * w), jnp.float32)

    def loss(src_, cur_, mlp_, custom):
        vol = cv_ops.sweep_mlp_volume(
            src_, cur_, ex, src_K, invK, planes, penalty, loc, mlp_,
            compute_dtype=jnp.float32, band_axis=band_axis,
            custom_vjp=custom)
        return jnp.sum(vol * gw)

    with jax.default_matmul_precision("highest"):
        val_a, grads_a = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            src, cur, mlp, False)
        val_c, grads_c = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            src, cur, mlp, custom)

    np.testing.assert_allclose(float(val_c), float(val_a), rtol=1e-5)
    labels = ("d_src", "d_cur", "d_mlp")
    for name, ga, gc in zip(labels, grads_a, grads_c):
        ja = jax.tree_util.tree_leaves(ga)
        jc = jax.tree_util.tree_leaves(gc)
        for la, lc in zip(ja, jc):
            scale = max(float(jnp.abs(la).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(lc), np.asarray(la), rtol=2e-4,
                atol=2e-4 * scale, err_msg=name)


def test_sweep_mlp_volume_custom_vjp_geometry_gets_zero_grads():
    """Geometry args are data: the custom VJP must return (symbolic)
    zero cotangents for extrinsics without error."""
    b, k, h, w, c, d = 1, 2, 16, 16, 4, 4
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    cur = jnp.asarray(rng.randn(b, h * w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)
    penalty = jnp.asarray(rng.rand(b, k, 3), jnp.float32)
    loc = jnp.zeros((b, k, 3), jnp.float32)
    mlp = _mlp_setup(rng, k, c)

    def loss(ex_):
        vol = cv_ops.sweep_mlp_volume(
            src, cur, ex_, src_K, invK, planes, penalty, loc, mlp,
            compute_dtype=jnp.float32, custom_vjp=True)
        return jnp.sum(vol)

    g = jax.grad(loss)(jnp.asarray(ex))
    assert float(jnp.abs(g).max()) == 0.0


def test_matmul_warp_is_differentiable():
    """The MXU warp must be trainable: finite gradients w.r.t. features
    (the gather warp's backward was a scatter — equally pathological on
    TPU; the matmul warp's backward is more matmuls)."""
    b, k, h, w, c, d = 1, 2, 16, 16, 4, 4
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    ex, src_K, invK = _geometry(b, k, h, w)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)

    def loss(s):
        wp = cv_ops.sweep_warp_matmul(s, ex, src_K, invK, planes)
        return jnp.sum(wp.sampled_bkdNc ** 2)

    g = jax.grad(loss)(src)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
