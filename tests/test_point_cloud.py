"""Point-cloud fusion tests on synthetic multi-view depth."""

import numpy as np

from simplerecon_tpu.fusion.point_cloud import (process_scene,
                                                voxel_downsample)


def _camera(tx=0.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 50.0
    K[0, 2] = K[1, 2] = 25.0
    pose = np.eye(4, dtype=np.float32)  # world_T_cam
    pose[0, 3] = tx
    return K, pose


def test_consistent_wall_fuses():
    """Three cameras seeing the same z=2 wall: most points consistent."""
    h = w = 50
    Ks, poses, depths = [], [], []
    for tx in (0.0, 0.05, -0.05):
        K, pose = _camera(tx)
        Ks.append(K)
        poses.append(pose)
        depths.append(np.full((h, w), 2.0, np.float32))
    K_f = np.stack(Ks)
    pose_f = np.stack(poses)
    invK_f = np.stack([np.linalg.inv(k) for k in Ks])
    # n_consistent counts *source* views only (the ref frame's trivial
    # self-match is excluded, as in the reference's src_idx != ref_idx)
    pts, _ = process_scene(np.stack(depths), pose_f, K_f, invK_f,
                           z_thresh=0.04, n_consistent=2,
                           voxel_downsample_size=0.02)
    assert len(pts) > 100
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.02


def test_inconsistent_frame_rejected():
    """A frame whose depth disagrees contributes (almost) no points."""
    h = w = 40
    Ks, poses, depths = [], [], []
    for i, tx in enumerate((0.0, 0.05, -0.05)):
        K, pose = _camera(tx)
        Ks.append(K)
        poses.append(pose)
        depths.append(np.full((h, w), 2.0 if i < 2 else 1.0, np.float32))
    K_f = np.stack(Ks)
    pose_f = np.stack(poses)
    invK_f = np.stack([np.linalg.inv(k) for k in Ks])
    pts, _ = process_scene(np.stack(depths), pose_f, K_f, invK_f,
                           z_thresh=0.04, n_consistent=2,
                           voxel_downsample_size=0.005)
    # needs both source views to agree -> nothing survives
    assert len(pts) == 0


def test_averaging_reduces_noise():
    """Consistent multi-view samples are averaged
    (`torch_point_cloud_fusion.py:83-91`): fused z-noise on a flat wall
    must be clearly below the single-view noise level."""
    h = w = 48
    sigma = 0.01
    rng = np.random.RandomState(0)
    Ks, poses, depths = [], [], []
    for tx in (0.0, 0.03, -0.03, 0.06):
        K, pose = _camera(tx)
        Ks.append(K)
        poses.append(pose)
        depths.append((2.0 + sigma * rng.randn(h, w)).astype(np.float32))
    K_f = np.stack(Ks)
    pose_f = np.stack(poses)
    invK_f = np.stack([np.linalg.inv(k) for k in Ks])
    pts, _ = process_scene(np.stack(depths), pose_f, K_f, invK_f,
                           z_thresh=0.08, n_consistent=3,
                           voxel_downsample_size=1e-6)
    assert len(pts) > 500
    fused_std = np.std(pts[:, 2] - 2.0)
    # 4 iid samples averaged -> sigma/2; allow slack for resample jitter
    assert fused_std < 0.75 * sigma, fused_std


def test_voxel_downsample():
    pts = np.array([[0.0, 0.0, 0.0], [0.001, 0.001, 0.001],
                    [1.0, 1.0, 1.0]], np.float32)
    out, _ = voxel_downsample(pts, 0.1)
    assert len(out) == 2
