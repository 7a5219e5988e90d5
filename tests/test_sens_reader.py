"""`.sens` decoder round-trip over a synthetic sensor stream."""

import io
import os
import struct
import zlib

import numpy as np
from PIL import Image

from simplerecon_tpu.data.sens_reader import SensorData


def write_fake_sens(path, n_frames=2, color_hw=(24, 32),
                    depth_hw=(12, 16)):
    rng = np.random.RandomState(0)
    ch, cw = color_hw
    dh, dw = depth_hw
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))                      # version
        name = b"fake_sensor"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):                                 # 4 calib mats
            f.write(struct.pack("f" * 16,
                                *np.eye(4, dtype=np.float32).flatten()))
        f.write(struct.pack("i", 2))                       # jpeg color
        f.write(struct.pack("i", 2))                       # occi depth
        f.write(struct.pack("I", cw))
        f.write(struct.pack("I", ch))
        f.write(struct.pack("I", dw))
        f.write(struct.pack("I", dh))
        f.write(struct.pack("f", 1000.0))                  # depth shift
        f.write(struct.pack("Q", n_frames))
        depths = []
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(struct.pack("f" * 16, *pose.flatten()))
            f.write(struct.pack("Q", i))                   # ts color
            f.write(struct.pack("Q", i))                   # ts depth
            img = (rng.rand(ch, cw, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG")
            color_bytes = buf.getvalue()
            depth = (rng.rand(dh, dw) * 4000).astype(np.uint16)
            depths.append(depth)
            depth_bytes = zlib.compress(depth.tobytes())
            f.write(struct.pack("Q", len(color_bytes)))
            f.write(struct.pack("Q", len(depth_bytes)))
            f.write(color_bytes)
            f.write(depth_bytes)
    return depths


def test_sens_roundtrip(tmp_path):
    sens_path = str(tmp_path / "scan.sens")
    depths = write_fake_sens(sens_path)
    sd = SensorData(sens_path)
    assert len(sd.frames) == 2
    assert sd.color_width == 32 and sd.depth_height == 12

    out = str(tmp_path / "out")
    sd.export_depth_images(os.path.join(out, "sensor_data"))
    sd.export_color_images(os.path.join(out, "sensor_data"))
    sd.export_poses(os.path.join(out, "sensor_data"))
    sd.export_intrinsics(os.path.join(out, "intrinsic"))

    d0 = np.asarray(Image.open(
        os.path.join(out, "sensor_data", "frame-000000.depth.png")))
    np.testing.assert_array_equal(d0, depths[0])
    pose1 = np.genfromtxt(
        os.path.join(out, "sensor_data", "frame-000001.pose.txt"))
    assert pose1[0, 3] == 1.0
    assert os.path.exists(
        os.path.join(out, "intrinsic", "intrinsic_depth.txt"))
