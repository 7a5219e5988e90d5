"""Visualization helper tests."""

import numpy as np

from simplerecon_tpu.utils.visualization import (colormap_image,
                                                 normalize_depth_robust,
                                                 quick_viz_export,
                                                 turbo_colormap)


def test_turbo_colormap_range_and_ends():
    x = np.linspace(0, 1, 11)
    rgb = turbo_colormap(x)
    assert rgb.shape == (11, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # turbo: blue-dominant low, red-dominant high
    low = turbo_colormap(np.array(0.2))
    assert low[2] > low[0]
    assert rgb[-1, 0] > rgb[-1, 2]


def test_colormap_image_invalid_pixels():
    d = np.full((4, 4), 2.0, np.float32)
    d[0, 0] = np.nan
    img = colormap_image(d, vmin=1.0, vmax=3.0)
    np.testing.assert_allclose(img[0, 0], (0.47, 0.47, 0.47), atol=1e-6)
    assert np.isfinite(img).all()


def test_normalize_depth_robust():
    d = np.concatenate([np.full(98, 2.0), [0.0, 100.0]])
    vmin, vmax = normalize_depth_robust(d.reshape(10, 10))
    assert 0.0 <= vmin <= 2.0 and 2.0 <= vmax <= 100.0
    assert vmax - vmin < 50  # outliers trimmed


def test_normals_from_depth_np_matches_jax():
    """The host-side numpy normals mirror must match
    ops.geometry.normals_from_depth (used for the video panels)."""
    import jax.numpy as jnp
    from simplerecon_tpu.ops import geometry as geo
    from simplerecon_tpu.utils.visualization import normals_from_depth_np

    rng = np.random.RandomState(0)
    h, w = 12, 16
    depth = (1.0 + rng.rand(h, w)).astype(np.float32)
    invK = np.eye(4, dtype=np.float32)
    invK[0, 0] = invK[1, 1] = 1.0 / 20.0
    invK[0, 2], invK[1, 2] = -w / 40.0, -h / 40.0

    ours = normals_from_depth_np(depth, invK)
    ref = np.asarray(geo.normals_from_depth(
        jnp.asarray(depth)[None], jnp.asarray(invK)[None]))[0]
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_depth_video_frame_panels():
    """Reference-layout frame assembly: left color column (CV argmax +
    RGB/src strip), ours column (depth + normals), GT column."""
    from simplerecon_tpu.scripts.visualize_scene_depth_output import (
        BUFFER_GAP, build_frame_panels)

    rng = np.random.RandomState(1)
    h, w = 32, 48
    frame = build_frame_panels(
        rgb_3hw=rng.randn(3, h, w).astype(np.float32),
        src_images_k3hw=rng.randn(3, 3, h, w).astype(np.float32),
        depth_pred_hw=(1 + rng.rand(h // 2, w // 2)).astype(np.float32),
        lowest_cost_hw=(1 + rng.rand(h // 2, w // 2)).astype(np.float32),
        gt_depth_hw=(1 + rng.rand(h, w)).astype(np.float32),
        invK_44=np.eye(4, dtype=np.float32),
        vmin=1.0, vmax=2.0, panel_hw=(h, w))
    assert frame.ndim == 3 and frame.shape[2] == 3
    # three columns of width w + two buffers, padded to 16
    exp_h = 2 * h + BUFFER_GAP
    exp_w = 3 * w + 2 * BUFFER_GAP
    assert frame.shape[0] == exp_h + (-exp_h) % 16
    assert frame.shape[1] == exp_w + (-exp_w) % 16
    assert np.isfinite(frame).all()
    assert frame.min() >= 0.0 and frame.max() <= 1.0


def test_load_meshes_and_include_normals(tmp_path):
    """Normal-colored mesh export: flat +z quad -> all vertices colored
    (0.5, 0.5, 1.0)."""
    from simplerecon_tpu.fusion.mesh import write_ply
    from simplerecon_tpu.scripts.load_meshes_and_include_normals import (
        main, vertex_normals)

    vertices = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                        np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = vertex_normals(vertices, faces)
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (4, 1)),
                               atol=1e-6)

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    write_ply(str(in_dir / "scan.ply"), vertices, faces)
    main(["--input_path", str(in_dir), "--output_path", str(out_dir)])
    out_path = out_dir / "scan.ply"
    assert out_path.exists()
    with open(out_path, "rb") as f:
        header = f.read(400)
    assert b"property uchar red" in header
    # color payload: xyz (12 bytes) + rgb; +z normal -> (127/128, 127/128, 255)
    with open(out_path, "rb") as f:
        data = f.read()
    body = data.split(b"end_header\n", 1)[1]
    rgb0 = np.frombuffer(body[12:15], np.uint8)
    assert rgb0[2] == 255 and 120 <= rgb0[0] <= 135


def test_quick_viz_export(tmp_path):
    rng = np.random.RandomState(0)
    outputs = {"depth_pred_s0_bhw1": rng.rand(1, 8, 8, 1).astype(
        np.float32), "lowest_cost_bhw": rng.rand(1, 8, 8)}
    cur = {"image_b3hw": rng.randn(1, 3, 16, 16).astype(np.float32),
           "depth_b1hw": (1 + rng.rand(1, 1, 8, 8)).astype(np.float32)}
    files = quick_viz_export(str(tmp_path), outputs, cur)
    assert len(files) == 4
    import os
    assert all(os.path.exists(f) for f in files)
