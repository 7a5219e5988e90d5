"""Fixture tests for 7Scenes, ARKit, COLMAP, and Scanniverse loaders."""

import os

import numpy as np
import pytest
from PIL import Image

from simplerecon_tpu.data.arkit import ArkitDataset
from simplerecon_tpu.data.colmap import ColmapDataset
from simplerecon_tpu.data.scanniverse import ScanniverseDataset
from simplerecon_tpu.data.seven_scenes import SevenScenesDataset

H, W = 64, 96


def _write_tuples(root, scan, ids, suffix="_tuple.txt", split="test"):
    tdir = os.path.join(root, "tuples")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, f"{split}{suffix}"), "w") as f:
        f.write(f"{scan} {' '.join(ids)}\n")
    return tdir


def test_seven_scenes(tmp_path):
    root = str(tmp_path)
    scan = "chess/seq-01"
    sdir = os.path.join(root, scan)
    os.makedirs(sdir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        fid = f"{i:06d}"
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sdir, f"frame-{fid}.color.png"))
        depth = (rng.rand(480, 640) * 3000 + 500).astype(np.uint16)
        Image.fromarray(depth).save(
            os.path.join(sdir, f"frame-{fid}.depth.proj.png"))
        pose = np.eye(4)
        pose[0, 3] = 0.2 * i
        np.savetxt(os.path.join(sdir, f"frame-{fid}.pose.txt"), pose)

    tdir = _write_tuples(root, scan, ["000000", "000001", "000002"])
    ds = SevenScenesDataset(dataset_path=root, split="test",
                            mv_tuple_file_suffix="_tuple.txt",
                            tuple_info_file_location=tdir,
                            image_height=H, image_width=W)
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    assert cur["depth_b1hw"].shape == (1, H // 2, W // 2)
    # hardcoded Kinect intrinsics scaled to depth res
    np.testing.assert_allclose(cur["K_s0_b44"][0, 0],
                               525.0 * (W // 2) / 640, rtol=1e-6)
    # pose rotated by rotx(pi/2): y_world <- z, z <- -y
    R = cur["world_T_cam_b44"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    valid = ds.get_valid_frame_ids("test", scan, store_computed=False)
    assert len(valid) == 3


def test_arkit(tmp_path):
    root = str(tmp_path)
    scan = "scan0"
    sdir = os.path.join(root, "scans", scan)
    for d in ("images", "poses", "intrinsics"):
        os.makedirs(os.path.join(sdir, d), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        fid = f"{i:06d}"
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sdir, "images", f"{fid}.png"))
        pose = np.eye(4)
        pose[1, 3] = 0.1 * i
        np.savetxt(os.path.join(sdir, "poses", f"{fid}.txt"), pose)
        np.savetxt(os.path.join(sdir, "intrinsics", f"{fid}.txt"),
                   np.array([500.0, 500.0, 320.0, 240.0, 640, 480]))

    tdir = _write_tuples(root, scan, ["000000", "000001", "000002"])
    ds = ArkitDataset(dataset_path=root, split="test",
                      mv_tuple_file_suffix="_tuple.txt",
                      tuple_info_file_location=tdir,
                      image_height=H, image_width=W)
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    # dummy depth: all ones, all valid
    assert (cur["depth_b1hw"] == 1.0).all()
    assert src["image_b3hw"].shape == (2, 3, H, W)
    valid = ds.get_valid_frame_ids("test", scan, store_computed=False)
    assert len(valid) == 3


def test_colmap(tmp_path):
    root = str(tmp_path)
    scan = "scan0"
    sparse = os.path.join(root, "scans", scan, "undistorted", "sparse")
    os.makedirs(os.path.join(sparse, "images_low_res"), exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# cameras\n1 PINHOLE 640 480 500.0 505.0 320.0 240.0\n")
    lines = ["# images"]
    for i in range(3):
        name = f"img{i}"
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sparse, "images_low_res", f"{name}.JPG"))
        # qvec = identity, tvec translated
        lines.append(f"{i + 1} 1 0 0 0 {0.1 * i} 0 0 1 {name}.JPG")
        lines.append("0 0 -1")  # points2D line (every other line)
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    tdir = _write_tuples(root, scan, ["img0", "img1", "img2"])
    ds = ColmapDataset(dataset_path=root, split="test",
                       mv_tuple_file_suffix="_tuple.txt",
                       tuple_info_file_location=tdir,
                       image_height=H, image_width=W)
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    R = cur["world_T_cam_b44"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # PINHOLE fy parsed separately
    np.testing.assert_allclose(cur["K_s0_b44"][1, 1],
                               505.0 * (H // 2) / 480, rtol=1e-5)


def test_scanniverse(tmp_path):
    root = str(tmp_path)
    scan = "scan0"
    sdir = os.path.join(root, "scans", scan)
    os.makedirs(sdir, exist_ok=True)
    rng = np.random.RandomState(0)
    blocks = []
    for i in range(3):
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(sdir, f"IMG_{i}.jpg"))
        blocks.append(f"""frames {{
  id: {i}
  camera {{
    width: 640
    height: 480
    f: 500.0
    px: 320.0
    py: 240.0
  }}
  pose {{
    rotation: [0.0, 0.0, 0.0, 1.0] translation: [{0.1 * i}, 0.0, 0.0]
  }}
}}""")
    with open(os.path.join(sdir, "frames.txt"), "w") as f:
        f.write("\n".join(blocks) + "\n")

    tdir = _write_tuples(root, scan, ["0", "1", "2"])
    ds = ScanniverseDataset(dataset_path=root, split="test",
                            mv_tuple_file_suffix="_tuple.txt",
                            tuple_info_file_location=tdir,
                            image_height=H, image_width=W)
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    R = cur["world_T_cam_b44"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(cur["K_s0_b44"][0, 0],
                               500.0 * (W // 2) / 640, rtol=1e-5)
