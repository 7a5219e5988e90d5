"""CLI: ScanNet v2 downloader.

Counterpart of
`data_scripts/scannet_wrangling_scripts/download_scannet.py`: fetches
`.sens` files (+ GT meshes and metadata) for the scans in a split after
the user has accepted the ScanNet terms of use. Files are then unpacked
with `simplerecon_tpu.data.sens_reader.SensorData`.

    python -m simplerecon_tpu.scripts.download_scannet \
        --out_dir /mnt/scannet --scan_list data_splits/.../scannetv2_test.txt
"""

from __future__ import annotations

import argparse
import os
import urllib.request

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/v2/scans"
FILE_TYPES = [".sens", "_vh_clean_2.ply", ".txt"]


def download_scan(scan_id: str, out_dir: str, file_types=None):
    file_types = file_types or FILE_TYPES
    scan_dir = os.path.join(out_dir, scan_id)
    os.makedirs(scan_dir, exist_ok=True)
    for ft in file_types:
        url = f"{BASE_URL}/{scan_id}/{scan_id}{ft}"
        dst = os.path.join(scan_dir, f"{scan_id}{ft}")
        if os.path.exists(dst):
            continue
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, dst)


def unpack_scan(scan_id: str, out_dir: str):
    from simplerecon_tpu.data.sens_reader import SensorData
    scan_dir = os.path.join(out_dir, scan_id)
    sens = os.path.join(scan_dir, f"{scan_id}.sens")
    sd = SensorData(sens)
    sensor_dir = os.path.join(scan_dir, "sensor_data")
    sd.export_color_images(sensor_dir)
    sd.export_depth_images(sensor_dir)
    sd.export_poses(sensor_dir)
    sd.export_intrinsics(os.path.join(scan_dir, "intrinsic"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scan_list", required=True)
    ap.add_argument("--unpack", action="store_true")
    args = ap.parse_args()
    with open(args.scan_list) as f:
        scans = [line.strip() for line in f if line.strip()]
    print("NOTE: you must have accepted the ScanNet terms of use; see "
          "https://github.com/ScanNet/ScanNet#scannet-data")
    for scan in scans:
        download_scan(scan, args.out_dir)
        if args.unpack:
            unpack_scan(scan, args.out_dir)


if __name__ == "__main__":
    main()
