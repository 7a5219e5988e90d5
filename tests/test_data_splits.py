"""Shipped data_splits + data-config integrity.

The reference ships canonical tuple/scan split files in `data_splits/`
(README.md:540-558: exact DVMVS keyframe reproduction, 25,590 tuples
over 100 scans). We ship the same files (they are data, not code) and
every `configs/data/*.yaml` must point at files that exist in-repo and
parse with the advertised tuple arity.
"""

import glob
import os

import pytest

from simplerecon_tpu.options import Options, load_options_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/data/*.yaml")))


def test_canonical_test_split_shape():
    """`test_eight_view_deepvmvs.txt` = 25,590 tuples over 100 scans,
    each line `scan_id f0 ... f7` (reference README.md:204, 540-558)."""
    path = os.path.join(
        REPO, "data_splits/ScanNetv2/standard_split/"
        "test_eight_view_deepvmvs.txt")
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    assert len(lines) == 25590
    scans = {ln.split()[0] for ln in lines}
    assert len(scans) == 100
    for ln in lines[:50] + lines[-50:]:
        parts = ln.split()
        assert len(parts) == 9  # scan + 8 frames
        assert parts[0].startswith("scene")
        assert all(p.isdigit() for p in parts[1:])


def test_scan_split_lists_match_reference_counts():
    """Standard ScanNetv2 scan lists: 1201 train / 312 val / 100 test."""
    base = os.path.join(REPO, "data_splits/ScanNetv2/standard_split")
    for name, count in [("scannetv2_train.txt", 1201),
                        ("scannetv2_val.txt", 312),
                        ("scannetv2_test.txt", 100)]:
        with open(os.path.join(base, name)) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        assert len(lines) == count, name


@pytest.mark.parametrize("config_path", DATA_CONFIGS,
                         ids=[os.path.basename(p) for p in DATA_CONFIGS])
def test_data_config_loads_and_split_files_exist(config_path):
    d = load_options_yaml(config_path)
    opts = Options()
    opts.update_from(d)
    assert opts.dataset in {"scannet", "7scenes", "vdr", "arkit",
                            "colmap", "scanniverse", "synthetic"}
    assert opts.num_images_in_tuple == 8
    assert opts.frame_tuple_type in {"default", "offline", "dense",
                                     "dense_offline"}

    # in-repo pointers must resolve (absolute /mnt paths are dataset
    # mounts that only exist in production)
    for field in ("tuple_info_file_location", "dataset_scan_split_file"):
        val = d.get(field, "")
        if val and not os.path.isabs(val):
            assert os.path.exists(os.path.join(REPO, val)), (field, val)

    # when the tuple dir is in-repo and the reference ships that tuple
    # file, it must exist here too (dense/train tuple files are
    # user-generated in the reference as well — not shipped)
    loc = d.get("tuple_info_file_location", "")
    if loc and not os.path.isabs(loc):
        tuple_file = os.path.join(REPO, loc,
                                  f"{opts.split}{opts.mv_tuple_file_suffix}")
        shipped = os.path.exists(
            os.path.join("/root/reference", loc,
                         f"{opts.split}{opts.mv_tuple_file_suffix}"))
        if shipped or not os.path.isdir("/root/reference"):
            assert os.path.exists(tuple_file), tuple_file


def test_dataset_reads_shipped_tuple_file(tmp_path):
    """The GenericMVSDataset tuple reader consumes the shipped canonical
    file directly (line schema parity with the reference loader,
    `generic_mvs_dataset.py:125-165`)."""
    from simplerecon_tpu.data.scannet import ScannetDataset

    loc = os.path.join(REPO, "data_splits/ScanNetv2/standard_split")
    ds = ScannetDataset(
        dataset_path=str(tmp_path), split="test",
        mv_tuple_file_suffix="_eight_view_deepvmvs.txt",
        tuple_info_file_location=loc,
        num_images_in_tuple=8,
        image_height=64, image_width=96)
    assert len(ds) == 25590
    scan, *frames = ds.frame_tuples[0].split()
    assert scan.startswith("scene") and len(frames) == 8
