"""Fused Pallas feature-volume kernel: parity vs the XLA path.

Runs in Pallas interpret mode on CPU; the same kernel compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplerecon_tpu.models.cost_volume import MLPFeatureVolume


def make_inputs(b=1, k=3, h=16, w=32, c=8, seed=0):
    rng = np.random.RandomState(seed)
    cur = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)

    # small random-ish poses: rotations near identity + translations
    extr = np.tile(np.eye(4, dtype=np.float32), (b, k, 1, 1))
    for i in range(k):
        angle = 0.05 * (i + 1)
        extr[:, i, 0, 0] = np.cos(angle)
        extr[:, i, 0, 2] = np.sin(angle)
        extr[:, i, 2, 0] = -np.sin(angle)
        extr[:, i, 2, 2] = np.cos(angle)
        extr[:, i, 0, 3] = 0.1 * (i + 1)
    poses = np.linalg.inv(extr.reshape(-1, 4, 4)).reshape(b, k, 4, 4)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 20.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    Ks = jnp.broadcast_to(jnp.asarray(K), (b, k, 4, 4))
    invK = jnp.broadcast_to(jnp.asarray(np.linalg.inv(K)), (b, 4, 4))
    return cur, src, jnp.asarray(extr), jnp.asarray(poses), Ks, invK


def run_volume(backend, d=4, tile=512):
    cur, src, extr, poses, Ks, invK = make_inputs()
    k = src.shape[1]
    mod = MLPFeatureVolume(num_depth_bins=d, num_source_views=k,
                           matching_dim_size=cur.shape[-1],
                           backend=backend, pallas_tile=tile,
                           pallas_warp_tile=tile,
                           dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), cur, src, extr, poses,
                         Ks, invK)
    vol, lowest, planes, _ = mod.apply(variables, cur, src, extr, poses,
                                       Ks, invK)
    return np.asarray(vol), np.asarray(lowest)


def test_pallas_v1_matches_xla():
    """Two-step path: XLA warp sweep + the metadata/MLP kernel."""
    vol_xla, low_xla = run_volume("xla")
    vol_pl, low_pl = run_volume("pallas_v1_interpret")
    assert vol_xla.shape == vol_pl.shape
    np.testing.assert_allclose(vol_xla, vol_pl, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(low_xla, low_pl, rtol=1e-5, atol=1e-5)


def test_pallas_fused_warp_matches_xla():
    """Fully fused path: in-kernel projection + two-hot MXU warp +
    metadata + MLP must match the XLA reference volume."""
    vol_xla, low_xla = run_volume("xla")
    vol_pl, low_pl = run_volume("pallas_interpret")
    assert vol_xla.shape == vol_pl.shape
    np.testing.assert_allclose(vol_xla, vol_pl, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(low_xla, low_pl, rtol=1e-5, atol=1e-5)


def test_pallas_tile_divides_pixels():
    # N = 16*32 = 512 divides the tile; a smaller tile also works
    vol_a, _ = run_volume("pallas_interpret", tile=256)
    vol_b, _ = run_volume("pallas_interpret", tile=512)
    np.testing.assert_allclose(vol_a, vol_b, rtol=1e-5, atol=1e-6)


def test_pallas_dot_volume_matches_xla():
    """Dot mode of the banded kernel vs the DotProductCostVolume XLA
    reduction (masked dots summed over views)."""
    from simplerecon_tpu.models.cost_volume import DotProductCostVolume

    cur, src, extr, poses, Ks, invK = make_inputs()

    def run(backend, return_mask=False):
        mod = DotProductCostVolume(num_depth_bins=4, backend=backend,
                                   dtype=jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), cur, src, extr,
                             poses, Ks, invK)
        vol, lowest, _, mask = mod.apply(variables, cur, src, extr,
                                         poses, Ks, invK,
                                         return_mask=return_mask)
        return np.asarray(vol), np.asarray(lowest), mask

    vol_xla, low_xla, _ = run("xla")
    vol_pl, low_pl, _ = run("pallas_interpret")
    assert vol_xla.shape == vol_pl.shape
    np.testing.assert_allclose(vol_pl, vol_xla, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(low_pl, low_xla, rtol=1e-5, atol=1e-5)

    # return_mask must keep the kernel path (eval CLI configuration) and
    # reproduce the XLA path's farthest-plane source-visibility mask
    vol_xm, _, mask_xla = run("xla", return_mask=True)
    vol_pm, _, mask_pl = run("pallas_interpret", return_mask=True)
    np.testing.assert_allclose(vol_pm, vol_xm, rtol=2e-4, atol=2e-4)
    assert mask_pl is not None
    np.testing.assert_array_equal(np.asarray(mask_pl) > 0.5,
                                  np.asarray(mask_xla) > 0.5)
