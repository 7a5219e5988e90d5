"""Data-layer tests over a synthetic on-disk ScanNet-style scan."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from simplerecon_tpu.data.loader import DataLoader, collate, to_train_schema
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.data.scannet import ScannetDataset
from simplerecon_tpu.data.vdr import VDRDataset

H, W = 64, 96  # loaded image size
NATIVE_W, NATIVE_H = 128, 96


def make_scannet_fixture(root, scan="scene0000_00", n_frames=4,
                         split="train"):
    sensor = os.path.join(root, "scans", scan, "sensor_data")
    intrin = os.path.join(root, "scans", scan, "intrinsic")
    os.makedirs(sensor, exist_ok=True)
    os.makedirs(intrin, exist_ok=True)

    rng = np.random.RandomState(0)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    # cx off-center so the flip's cx mirroring is observable
    K[0, 2], K[1, 2] = NATIVE_W / 2 + 6.0, NATIVE_H / 2
    np.savetxt(os.path.join(intrin, "intrinsic_depth.txt"), K)
    with open(os.path.join(root, "scans", scan, f"{scan}.txt"), "w") as f:
        f.write(f"depthWidth = {NATIVE_W}\ndepthHeight = {NATIVE_H}\n"
                f"numColorFrames = {n_frames}\n")

    for i in range(n_frames):
        fid = f"{i:06d}"
        img = (rng.rand(NATIVE_H, NATIVE_W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(sensor, f"frame-{fid}.color.jpg"))
        depth_mm = (rng.rand(NATIVE_H, NATIVE_W) * 3000 + 500
                    ).astype(np.uint16)
        depth_mm[0, 0] = 0  # one invalid pixel
        Image.fromarray(depth_mm).save(
            os.path.join(sensor, f"frame-{fid}.depth.png"))
        pose = np.eye(4)
        pose[0, 3] = 0.3 * i  # distinct translations for sorting
        np.savetxt(os.path.join(sensor, f"frame-{fid}.pose.txt"), pose)

    tuples_dir = os.path.join(root, "tuples")
    os.makedirs(tuples_dir, exist_ok=True)
    frames = " ".join(f"{i:06d}" for i in range(n_frames))
    for sp in ("train", "val", "test"):
        with open(os.path.join(
                tuples_dir, f"{sp}_eight_view_deepvmvs.txt"), "w") as f:
            f.write(f"{scan} {frames}\n{scan} {frames}\n")
    return root


@pytest.fixture
def scannet_root(tmp_path):
    return make_scannet_fixture(str(tmp_path))


def make_dataset(root, split="train", **kw):
    return ScannetDataset(
        dataset_path=root, split=split,
        mv_tuple_file_suffix="_eight_view_deepvmvs.txt",
        tuple_info_file_location=os.path.join(root, "tuples"),
        image_height=H, image_width=W,
        rng=np.random.RandomState(3), **kw)


def test_element_schema_and_shapes(scannet_root):
    ds = make_dataset(scannet_root, split="val")
    assert len(ds) == 2
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    assert cur["depth_b1hw"].shape == (1, H // 2, W // 2)
    assert cur["world_T_cam_b44"].shape == (4, 4)
    for i in range(5):
        assert cur[f"K_s{i}_b44"].shape == (4, 4)
        np.testing.assert_allclose(
            cur[f"invK_s{i}_b44"] @ cur[f"K_s{i}_b44"], np.eye(4),
            atol=1e-4)
    # K_s0 maps to depth resolution: fx scaled by (W/2)/NATIVE_W
    np.testing.assert_allclose(cur["K_s0_b44"][0, 0],
                               100.0 * (W // 2) / NATIVE_W, rtol=1e-6)
    assert src["image_b3hw"].shape == (3, 3, H, W)
    assert src["world_T_cam_b44"].shape == (3, 4, 4)
    # invalid depth pixel became NaN
    assert np.isnan(cur["depth_b1hw"]).sum() >= 0


def test_src_sorted_by_pose_distance(scannet_root):
    ds = make_dataset(scannet_root, split="val")
    cur, src = ds[0]
    # ref = frame 0 at x=0; sources at x=0.3, 0.6, 0.9 -> sorted ascending
    tx = src["world_T_cam_b44"][:, 0, 3]
    assert np.all(np.diff(tx) > 0)


def test_train_flip_is_geometrically_consistent(scannet_root):
    """When a flip fires, pose is mirrored and the image x-flipped."""
    ds = make_dataset(scannet_root, split="train")
    saw = {True: None, False: None}
    for _ in range(30):
        cur, _ = ds[0]
        flipped = cur["world_T_cam_b44"][0, 0] < 0  # diag(-1,..) mirror
        saw[bool(flipped)] = cur
        if all(v is not None for v in saw.values()):
            break
    assert all(v is not None for v in saw.values()), "flip never toggled"
    # cx differs between flipped/unflipped intrinsics
    assert not np.isclose(saw[True]["K_s0_b44"][0, 2],
                          saw[False]["K_s0_b44"][0, 2])


def test_loader_batches_and_schema_adapter(scannet_root):
    ds = make_dataset(scannet_root, split="val")
    dl = DataLoader(ds, batch_size=2, num_workers=2,
                    adapter=to_train_schema)
    batches = list(dl)
    assert len(batches) == 1
    batch = batches[0]
    assert batch["cur"]["image_b3hw"].shape == (2, 3, H, W)
    assert batch["cur"]["depth_bhw"].shape == (2, H // 2, W // 2)
    assert batch["cur"]["mask_b_bhw"].dtype == bool
    assert batch["src"]["depth_bkhw"].shape == (2, 3, H // 2, W // 2)
    assert np.isfinite(batch["cur"]["depth_bhw"]).all()


def test_registry(scannet_root, tmp_path):
    split_file = tmp_path / "split.txt"
    split_file.write_text("scene0000_00\n")
    cls, scans = get_dataset("scannet", str(split_file), verbose=False)
    assert cls is ScannetDataset
    assert scans == ["scene0000_00"]
    with pytest.raises(ValueError):
        get_dataset("nope", None, verbose=False)


def test_valid_frames_scan(scannet_root):
    ds = make_dataset(scannet_root, split="train")
    valid = ds.get_valid_frame_ids("train", "scene0000_00",
                                   store_computed=False)
    assert len(valid) == 4
    assert valid[0].split(" ")[0] == "scene0000_00"


def make_vdr_fixture(root, scan="vdr0"):
    scans = os.path.join(root, "scans", scan)
    os.makedirs(scans, exist_ok=True)
    rng = np.random.RandomState(1)
    frames = []
    for i in range(3):
        img = (rng.rand(192, 256, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scans, f"frame_{i}.jpg"))
        depth = (rng.rand(192, 256) + 0.5).astype(np.float32)
        depth.tofile(os.path.join(scans, f"depth_{i}.bin"))
        conf = np.full((192, 256), 2, np.uint8)
        conf.tofile(os.path.join(scans, f"confidence_{i}.bin"))
        pose = np.eye(4, dtype=np.float32)
        pose[1, 3] = 0.1 * i
        frames.append({
            "pose4x4": pose.T.flatten().tolist(),  # stored column-major
            "intrinsics": [200.0, 200.0, 128.0, 96.0, 0.0],
            "resolution": [256, 192],
        })
    with open(os.path.join(scans, "capture.json"), "w") as f:
        json.dump({"frames": frames}, f)
    tuples = os.path.join(root, "tuples")
    os.makedirs(tuples, exist_ok=True)
    with open(os.path.join(tuples, "test_tuple.txt"), "w") as f:
        f.write(f"{scan} 0 1 2\n")
    return root


def test_vdr_dataset(tmp_path):
    root = make_vdr_fixture(str(tmp_path))
    ds = VDRDataset(dataset_path=root, split="test",
                    mv_tuple_file_suffix="_tuple.txt",
                    tuple_info_file_location=os.path.join(root, "tuples"),
                    image_height=H, image_width=W)
    cur, src = ds[0]
    assert cur["image_b3hw"].shape == (3, H, W)
    assert cur["depth_b1hw"].shape == (1, H // 2, W // 2)
    assert np.isfinite(cur["depth_b1hw"]).all()  # all conf != 0
    assert src["image_b3hw"].shape == (2, 3, H, W)
    # pose finite and rotation orthonormal after GL->CV + gravity rotation
    R = cur["world_T_cam_b44"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_train_schema_matches_train_step_expectations(scannet_root):
    """The loader's train-schema batch must carry every key the train
    step consumes (caught live: K_s0_b44 vs K_s0_bk44 mismatch)."""
    ds = make_dataset(scannet_root, split="train")
    dl = DataLoader(ds, batch_size=2, num_workers=2,
                    adapter=to_train_schema)
    batch = next(iter(dl))
    cur, src = batch["cur"], batch["src"]
    m = 1  # matching scale
    for key in ("image_b3hw", "depth_bhw", "mask_b_bhw", "invK_s0_b44",
                f"invK_s{m}_b44", "world_T_cam_b44", "cam_T_world_b44"):
        assert key in cur, key
    for key in ("image_b3hw", "depth_bkhw", f"K_s{m}_b44",
                "world_T_cam_b44", "cam_T_world_b44"):
        assert key in src, key
    assert "K_s0_b44" in src or "K_s0_bk44" in src


def test_device_prefetch_preserves_batches(scannet_root):
    """`device_prefetch` must yield the same batches in order, with
    numeric leaves moved onto the device and non-array leaves intact."""
    import jax

    from simplerecon_tpu.data.loader import device_prefetch

    ds = make_dataset(scannet_root, split="val")
    dl = DataLoader(ds, batch_size=2, num_workers=2)
    host = list(dl)
    dev = list(device_prefetch(DataLoader(ds, batch_size=2,
                                          num_workers=2), size=2))
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        assert isinstance(db["cur"]["image_b3hw"], jax.Array)
        np.testing.assert_allclose(
            np.asarray(db["cur"]["image_b3hw"]),
            hb["cur"]["image_b3hw"], rtol=0, atol=0)
