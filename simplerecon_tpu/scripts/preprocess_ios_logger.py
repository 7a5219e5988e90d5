"""CLI: ios-logger (ARKit) capture preprocessing.

Counterpart of `data_scripts/ios_logger_preprocessing.py` +
`arkit_dataset.process_data` (`:421-652`): extract frames from
`Frames.m4v` with OpenCV, sync `Frames.txt` (timestamp, frame, fx, fy,
cx, cy) with `ARposes.txt` (timestamp, tx ty tz, qw qx qy qz) by nearest
timestamp, convert quaternions to matrices with the ARKit axis flip +
`rotx(pi/2)` gravity alignment, and write the `images/ poses/
intrinsics/` layout `ArkitDataset` reads.

    python -m simplerecon_tpu.scripts.preprocess_ios_logger \
        --dataset_path /mnt/arkit --scan_id my_scan
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from simplerecon_tpu.ops.geometry import rotx

ARKIT_FLIP = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)


def quat_wxyz_to_rotmat(q) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def arkit_pose_to_world_T_cam(trans, quat_wxyz) -> np.ndarray:
    R = quat_wxyz_to_rotmat(quat_wxyz) @ ARKIT_FLIP
    R = rotx(np.pi / 2) @ R
    t = rotx(np.pi / 2) @ np.asarray(trans, np.float64)
    world_T_cam = np.eye(4)
    world_T_cam[:3, :3] = R
    world_T_cam[:3, 3] = t
    return world_T_cam


def sync_intrinsics_and_poses(frames_lines, pose_lines):
    """Nearest-timestamp association (`arkit_dataset.py:608+`)."""
    frames = []
    for line in frames_lines:
        vals = [float(v) for v in line.replace(",", " ").split()]
        if len(vals) >= 6:
            frames.append(vals)  # [ts, frame_idx, fx, fy, cx, cy]
    poses = []
    for line in pose_lines:
        vals = [float(v) for v in line.replace(",", " ").split()]
        if len(vals) >= 8:
            poses.append(vals)  # [ts, tx, ty, tz, qw, qx, qy, qz]
    pose_ts = np.array([p[0] for p in poses])
    synced = []
    for f in frames:
        i = int(np.argmin(np.abs(pose_ts - f[0])))
        synced.append((f, poses[i]))
    return synced


def process_scan(scan_dir: str):
    import cv2

    images_dir = os.path.join(scan_dir, "images")
    poses_dir = os.path.join(scan_dir, "poses")
    intr_dir = os.path.join(scan_dir, "intrinsics")
    for d in (images_dir, poses_dir, intr_dir):
        os.makedirs(d, exist_ok=True)

    with open(os.path.join(scan_dir, "Frames.txt")) as f:
        frames_lines = [line for line in f if not line.startswith("#")]
    with open(os.path.join(scan_dir, "ARposes.txt")) as f:
        pose_lines = [line for line in f if not line.startswith("#")]
    synced = sync_intrinsics_and_poses(frames_lines, pose_lines)

    cap = cv2.VideoCapture(os.path.join(scan_dir, "Frames.m4v"))
    count = 0
    for frame_info, pose_info in synced:
        ok, frame = cap.read()
        if not ok:
            break
        fid = f"{count:06d}"
        cv2.imwrite(os.path.join(images_dir, f"{fid}.png"), frame)
        world_T_cam = arkit_pose_to_world_T_cam(pose_info[1:4],
                                                pose_info[4:8])
        np.savetxt(os.path.join(poses_dir, f"{fid}.txt"), world_T_cam)
        _, _, fx, fy, cx, cy = frame_info[:6]
        h, w = frame.shape[:2]
        np.savetxt(os.path.join(intr_dir, f"{fid}.txt"),
                   np.array([fx, fy, cx, cy, w, h]))
        count += 1
    cap.release()
    print(f"{scan_dir}: exported {count} frames")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--scan_id", default=None)
    args = ap.parse_args()
    scans_dir = os.path.join(args.dataset_path, "scans")
    scans = ([args.scan_id] if args.scan_id
             else sorted(os.listdir(scans_dir)))
    for scan in scans:
        process_scan(os.path.join(scans_dir, scan))


if __name__ == "__main__":
    main()
