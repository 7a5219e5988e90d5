"""Native rasterizer tests on a known quad."""

import numpy as np

from simplerecon_tpu.render import Renderer, SmoothBirdsEyeCamera


def _quad(z=2.0, half=1.0):
    verts = np.array([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]], np.float32)
    # winding chosen so face normals point toward the camera (-z) in the
    # CV image convention (y down)
    faces = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    return verts, faces


def _K(f=50.0, c=32.0):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2] = K[1, 2] = c
    return K


def test_renders_quad_depth_and_color():
    r = Renderer(height=64, width=64)
    verts, faces = _quad(z=2.0)
    rgb, depth = r.render_mesh(verts, faces, np.eye(4), _K(),
                               base_color=(1.0, 0.0, 0.0))
    center = depth[32, 32]
    assert abs(center - 2.0) < 1e-3
    assert rgb[32, 32, 0] > 100 and rgb[32, 32, 2] < 60  # red-ish shaded
    # background is white where quad doesn't project
    assert (rgb[0, 0] == 255).all() and depth[0, 0] == 0.0


def test_zbuffer_orders_triangles():
    r = Renderer(height=64, width=64)
    v_near, f_near = _quad(z=1.0, half=0.3)
    v_far, f_far = _quad(z=3.0, half=0.3)
    verts = np.concatenate([v_far, v_near])
    faces = np.concatenate([f_far, f_near + 4])
    _, depth = r.render_mesh(verts, faces, np.eye(4), _K())
    assert abs(depth[32, 32] - 1.0) < 1e-3  # near quad wins


def test_backface_culling():
    r = Renderer(height=32, width=32)
    verts, faces = _quad(z=2.0)
    faces_flipped = faces[:, ::-1].copy()  # reversed winding
    _, d_front = r.render_mesh(verts, faces, np.eye(4), _K(25.0, 16.0))
    _, d_back = r.render_mesh(verts, faces_flipped, np.eye(4),
                              _K(25.0, 16.0))
    # one of the two windings is culled, the other visible
    assert (d_front[16, 16] > 0) != (d_back[16, 16] > 0)


def test_birdseye_camera_smooths():
    cam = SmoothBirdsEyeCamera(height_above=3.0, alpha=0.5, up_axis=1)
    p1 = np.eye(4)
    p2 = np.eye(4)
    p2[:3, 3] = [2.0, 0.0, 0.0]
    t1 = cam.get_bird_eye_trans(p1)
    t2 = cam.get_bird_eye_trans(p2)
    # camera is above (negative y = up in ScanNet gravity convention)
    assert t1[1, 3] < 0
    # smoothing: moved toward p2 but not all the way
    assert 0.0 < t2[0, 3] < 2.0
    # valid rotation
    R = t2[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_synthetic_room_every_frame_sees_geometry():
    """Winding regression guard: before round 5 BOTH room walls were
    wound away from the camera (backface-culled), so the synthetic
    fixture silently supervised with the floor alone (0% valid pixels
    in frames >= 38). Every trajectory frame must now be mostly valid."""
    from simplerecon_tpu.data.synthetic import (camera_trajectory,
                                                make_room_mesh)
    v, f, c = make_room_mesh(tess=16)
    r = Renderer(32, 48)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 0.9 * 48
    K[0, 2], K[1, 2] = 24.0, 16.0
    for i, pose in enumerate(camera_trajectory(48)):
        _, depth = r.render_mesh(v, f, pose, K, vert_colors=c)
        valid = float((depth > 0).mean())
        assert valid > 0.5, f"frame {i}: only {valid:.2f} valid"
