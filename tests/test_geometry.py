"""Unit tests for geometry kernels: hand values + round trips + torch parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from simplerecon_tpu.ops import geometry as geo


def make_K(fx, fy, cx, cy):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


def random_pose(rng):
    """Random rigid transform."""
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(-np.pi / 3, np.pi / 3)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3) * 0.5
    return T.astype(np.float32)


class TestPixelGrid:
    def test_half_pixel_centers(self):
        g = np.asarray(geo.pixel_grid(2, 3))
        # row-major over (y, x); coords are (x+0.5, y+0.5, 1)
        assert g.shape == (6, 3)
        np.testing.assert_allclose(g[0], [0.5, 0.5, 1.0])
        np.testing.assert_allclose(g[1], [1.5, 0.5, 1.0])
        np.testing.assert_allclose(g[3], [0.5, 1.5, 1.0])
        np.testing.assert_allclose(g[:, 2], 1.0)


class TestBackprojectProject:
    def test_backproject_hand_value(self):
        K = make_K(2.0, 2.0, 1.5, 1.0)
        invK = np.linalg.inv(K).astype(np.float32)
        depth = np.full((1, 2, 3), 4.0, dtype=np.float32)
        pts = np.asarray(geo.backproject_depth(jnp.asarray(depth),
                                               jnp.asarray(invK[None])))
        # pixel (0,0) center (0.5, 0.5): ray = ((0.5-1.5)/2, (0.5-1)/2, 1)
        np.testing.assert_allclose(pts[0, 0], [-2.0, -1.0, 4.0], atol=1e-6)

    def test_project_backproject_roundtrip(self, rng):
        h, w = 8, 10
        K = make_K(20.0, 22.0, w / 2, h / 2)
        invK = np.linalg.inv(K).astype(np.float32)
        depth = rng.uniform(1.0, 5.0, (2, h, w)).astype(np.float32)
        pts = geo.backproject_depth(jnp.asarray(depth), jnp.asarray(
            np.stack([invK, invK])))
        # project with identity extrinsics: must recover the pixel grid + depth
        eye = np.stack([np.eye(4, dtype=np.float32)] * 2)
        uvz = np.asarray(geo.project_points(pts, jnp.asarray(np.stack([K, K])),
                                            jnp.asarray(eye)))
        grid = np.asarray(geo.pixel_grid(h, w))
        for b in range(2):
            np.testing.assert_allclose(uvz[b, :, :2], grid[:, :2], atol=1e-3)
            np.testing.assert_allclose(uvz[b, :, 2],
                                       depth[b].reshape(-1), atol=1e-4)

    def test_project_safe_divide_at_zero_depth(self):
        # points exactly at z=0 must not produce inf (bug-fix #3 semantics,
        # utils/geometry_utils.py:82-89)
        pts = jnp.asarray(np.array([[[1.0, 2.0, 0.0]]], dtype=np.float32))
        K = jnp.asarray(make_K(1.0, 1.0, 0.0, 0.0)[None])
        eye = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        uvz = np.asarray(geo.project_points(pts, K, eye))
        assert np.all(np.isfinite(uvz))
        # scale=1 when |z| <= eps: uv equals raw cam xy
        np.testing.assert_allclose(uvz[0, 0, :2], [1.0, 2.0], atol=1e-6)

    def test_transform_points_matches_matmul(self, rng):
        T = random_pose(rng)
        pts = rng.randn(1, 5, 3).astype(np.float32)
        got = np.asarray(geo.transform_points(jnp.asarray(T[None]),
                                              jnp.asarray(pts)))
        want = (T[:3, :3] @ pts[0].T + T[:3, 3:4]).T
        np.testing.assert_allclose(got[0], want, atol=1e-5)


class TestPoseDistance:
    def test_identity_pose_is_zero(self):
        eye = jnp.asarray(np.eye(4, dtype=np.float32)[None])
        c, r, t = geo.pose_distance(eye)
        np.testing.assert_allclose(np.asarray(c), [0.0], atol=1e-6)

    def test_pure_translation(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [3.0, 0.0, 4.0]
        c, r, t = geo.pose_distance(jnp.asarray(T[None]))
        np.testing.assert_allclose(np.asarray(t), [5.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(c), [5.0], atol=1e-6)

    def test_rotation_measure_formula(self, rng):
        T = random_pose(rng)
        T[:3, 3] = 0
        c, r, t = geo.pose_distance(jnp.asarray(T[None]))
        trace = np.trace(T[:3, :3])
        want = np.sqrt(2 * (1 - min(3.0, trace) / 3))
        np.testing.assert_allclose(np.asarray(r)[0], want, atol=1e-5)

    def test_matches_dvmvs_numpy_reference(self, rng):
        """Cross-check against the keyframe buffer's numpy implementation."""
        from simplerecon_tpu.data.keyframe_buffer import pose_distance as np_pd
        a, b = random_pose(rng), random_pose(rng)
        rel = np.linalg.inv(a) @ b
        c_np, r_np, t_np = np_pd(a, b)
        c_j, r_j, t_j = geo.pose_distance(jnp.asarray(rel[None]))
        np.testing.assert_allclose(float(c_j[0]), c_np, atol=1e-5)


class TestRaysAndNormals:
    def test_camera_rays_unit_norm_and_direction(self, rng):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [1.0, 0.0, 0.0]
        pts = np.array([[[2.0, 0.0, 0.0], [1.0, 3.0, 4.0]]], dtype=np.float32)
        rays = np.asarray(geo.get_camera_rays(jnp.asarray(pose[None]),
                                              jnp.asarray(pts)))
        np.testing.assert_allclose(rays[0, 0], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(rays[0, 1], [0.0, 0.6, 0.8], atol=1e-6)

    def test_normals_of_fronto_parallel_plane(self):
        # constant-depth plane -> normals point along -z (camera looks +z;
        # cross(dx, dy) of a plane with increasing x,y gives -z).
        h, w = 16, 20
        K = make_K(10.0, 10.0, w / 2, h / 2)
        invK = np.linalg.inv(K).astype(np.float32)
        depth = np.full((1, h, w), 2.0, dtype=np.float32)
        n = np.asarray(geo.normals_from_depth(jnp.asarray(depth),
                                              jnp.asarray(invK[None])))
        inner = n[0, 4:-4, 4:-4]
        np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-4)
        np.testing.assert_allclose(inner[..., 0], 0.0, atol=1e-4)

    def test_cosine_similarity_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        a = rng.randn(4, 7, 3).astype(np.float32)
        b = rng.randn(4, 7, 3).astype(np.float32)
        b[0, 0] = 0.0  # exercise the eps clamp
        want = F.cosine_similarity(torch.from_numpy(a), torch.from_numpy(b),
                                   dim=-1, eps=1e-5).numpy()
        got = np.asarray(geo.cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestRotations:
    def test_qvec_identity(self):
        np.testing.assert_allclose(geo.qvec2rotmat([1, 0, 0, 0]), np.eye(3))

    def test_rotx_90(self):
        R = geo.rotx(np.pi / 2)
        np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-12)
