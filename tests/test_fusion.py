"""TSDF integration + native marching cubes tests on synthetic geometry."""

import numpy as np
import pytest

from simplerecon_tpu.fusion import mesh as mesh_lib
from simplerecon_tpu.fusion.tsdf import TSDF, TSDFFuser


def test_marching_cubes_sphere():
    # SDF of a sphere of radius 5 centered in a 16^3 grid
    n = 16
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center, r = (n - 1) / 2.0, 5.0
    sdf = np.sqrt(((g - center) ** 2).sum(0)) - r
    verts, faces = mesh_lib.marching_cubes(sdf, level=0.0)
    assert len(verts) > 50 and len(faces) > 50
    # vertices lie near the sphere surface
    d = np.linalg.norm(verts - center, axis=1)
    assert np.all(np.abs(d - r) < 0.3)
    # faces index valid vertices; mesh is shared-vertex (deduped)
    assert faces.max() < len(verts)
    assert len(verts) < 3 * len(faces)  # heavy vertex sharing


def test_marching_cubes_nan_masking():
    n = 12
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    sdf = np.sqrt(((g - (n - 1) / 2.0) ** 2).sum(0)) - 4.0
    sdf[: n // 2] = np.nan  # unobserved half
    verts, _ = mesh_lib.marching_cubes(sdf, level=0.0)
    assert len(verts) > 0
    assert np.all(verts[:, 0] >= n // 2 - 1)  # nothing in the NaN half


def test_ply_roundtrip(tmp_path):
    verts = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.ply")
    mesh_lib.write_ply(p, verts, faces)
    v2, f2 = mesh_lib.read_ply(p)
    np.testing.assert_allclose(verts, v2, rtol=1e-6)
    np.testing.assert_array_equal(faces, f2)


def _lookat_camera():
    """Camera at origin looking down +z, 64x64, f=64."""
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 64.0
    K[0, 2] = K[1, 2] = 32.0
    cam_T_world = np.eye(4, dtype=np.float32)
    return K, cam_T_world


def test_tsdf_integrates_flat_wall():
    """A flat wall at z=2m seen from the origin must carve a surface
    near z=2 in the volume."""
    K, cam_T_world = _lookat_camera()
    depth = np.full((1, 64, 64), 2.0, np.float32)

    bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 3.2]])
    tsdf = TSDF.from_bounds(bounds, voxel_size=0.08)
    fuser = TSDFFuser(tsdf, max_depth=3.0)
    fuser.integrate_depth(depth, cam_T_world[None], K[None])

    values, weights = tsdf.to_numpy()
    assert weights.max() > 0
    # voxels well in front of the wall (z ~ 1.0m, central) -> positive tsdf
    zi_front = int((1.0 - bounds[2, 0]) / 0.08)
    # just behind the wall but inside the 3-voxel truncation band
    zi_behind = int((2.15 - bounds[2, 0]) / 0.08)
    ci = values.shape[0] // 2
    assert values[ci, ci, zi_front] > 0.5
    assert values[ci, ci, zi_behind] < 0.0

    verts, faces = tsdf.to_mesh()
    assert len(verts) > 0
    # extracted surface near z = 2m
    assert abs(np.median(verts[:, 2]) - 2.0) < 0.12


def test_tsdf_dims_rounded_to_vox_mod():
    tsdf = TSDF.from_bounds(np.array([[0, 1.0], [0, 1.0], [0, 1.0]]), 0.3)
    assert all(d % 8 == 0 for d in tsdf.dims)


def test_tsdf_color_fusion_known_color(tmp_path):
    """Fusing a red wall must produce red mesh vertices and a colored
    PLY — the capability the reference gets from Open3D's color TSDF
    (`tools/fusers_helper.py:125-186`)."""
    K, cam_T_world = _lookat_camera()
    depth = np.full((1, 64, 64), 2.0, np.float32)
    color = np.zeros((1, 3, 64, 64), np.float32)
    color[:, 0] = 1.0  # pure red, [0,1] range

    bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 3.2]])
    tsdf = TSDF.from_bounds(bounds, voxel_size=0.08, with_color=True)
    fuser = TSDFFuser(tsdf, max_depth=3.0)
    fuser.integrate_depth(depth, cam_T_world[None], K[None],
                          color_b3hw=color)

    verts, faces, vcols = tsdf.to_mesh(return_colors=True)
    assert len(verts) > 0 and vcols is not None
    assert vcols.shape == (len(verts), 3)
    # surface vertices must come out red (weighted-mean color update)
    assert np.median(vcols[:, 0]) > 0.9
    assert np.median(vcols[:, 1]) < 0.1
    assert np.median(vcols[:, 2]) < 0.1


def test_our_fuser_color_end_to_end(tmp_path):
    """OurFuser with fuse_color: imagenet-normalized input color is
    un-normalized internally; the exported PLY carries vertex colors."""
    from simplerecon_tpu.fusion.fusers import OurFuser
    from simplerecon_tpu.ops.image import imagenet_normalize
    import jax.numpy as jnp

    K, cam_T_world = _lookat_camera()
    depth = np.full((1, 64, 64), 2.0, np.float32)
    rgb = np.zeros((1, 64, 64, 3), np.float32)
    rgb[..., 1] = 1.0  # pure green
    norm = np.asarray(imagenet_normalize(jnp.asarray(rgb)))
    color_b3hw = norm.transpose(0, 3, 1, 2)

    fuser = OurFuser(fusion_resolution=0.08, max_fusion_depth=3.0,
                     fuse_color=True,
                     bounds_3x2=np.array([[-1.0, 1.0], [-1.0, 1.0],
                                          [0.0, 3.2]]))
    fuser.fuse_frames(depth[:, None], K[None], cam_T_world[None],
                      color_b3hw)
    verts, faces, vcols = fuser.get_mesh(include_colors=True)
    assert vcols is not None and len(vcols) == len(verts)
    assert np.median(vcols[:, 1]) > 0.85

    path = fuser.export_mesh(str(tmp_path / "colored.ply"))
    with open(path, "rb") as f:
        header = f.read(400)
    assert b"red" in header and b"green" in header and b"blue" in header


def test_bounds_from_trajectory_tracks_long_walk():
    """An ARKit-style unbounded walkthrough must get a grid sized from
    the camera path, not the reference's +-10 m (500^3 voxel) fallback
    box (`/root/reference/tools/tsdf.py:96-100`)."""
    from simplerecon_tpu.fusion.fusers import (OurFuser,
                                               bounds_from_trajectory)

    # 30 m corridor walk along +x at y=z~0
    n = 60
    poses = np.broadcast_to(np.eye(4, dtype=np.float32),
                            (n, 4, 4)).copy()
    poses[:, 0, 3] = np.linspace(0.0, 30.0, n)

    bounds = bounds_from_trajectory(poses, max_fusion_depth=3.0)
    # x spans the walk + frustum margin; y/z stay frustum-sized
    assert bounds[0, 0] <= 0.0 and bounds[0, 1] >= 30.0
    assert bounds[0, 1] - bounds[0, 0] < 45.0
    assert bounds[1, 1] - bounds[1, 0] < 15.0
    assert bounds[2, 1] - bounds[2, 0] < 15.0

    # exact frustum bounds with intrinsics are tighter still
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 60.0
    K[0, 2], K[1, 2] = 32.0, 24.0
    tight = bounds_from_trajectory(poses, 3.0,
                                   invK_44=np.linalg.inv(K),
                                   image_hw=(48, 64))
    assert tight[1, 1] - tight[1, 0] < bounds[1, 1] - bounds[1, 0]
    # forward frustum only: little volume behind the cameras
    assert tight[2, 0] > -1.0

    # conservative (no-intrinsics) trajectory bounds via the fuser API
    fuser = OurFuser(fusion_resolution=0.08, max_fusion_depth=3.0,
                     trajectory_world_T_cam=poses)
    dims = fuser.fuser.tsdf.dims
    assert dims[0] > dims[1] and dims[0] > dims[2]
    assert dims[1] < 200 and dims[2] < 200

    # frustum-exact bounds: far below the 250^3 voxels the 0.08 m
    # fallback box would allocate
    fuser = OurFuser(fusion_resolution=0.08, max_fusion_depth=3.0,
                     bounds_3x2=tight)
    assert np.prod(fuser.fuser.tsdf.dims) < 0.15 * 250 ** 3
