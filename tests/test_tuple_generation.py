"""Tuple-generation tests over synthetic pose trajectories."""

import numpy as np
import pytest

from simplerecon_tpu.data.tuple_generation import (
    compute_offline_tuple, crawl_subsequences_train, default_dvmvs_tuples,
    dense_dvmvs_tuples, pad_tuple)


def make_trajectory(n=60, step=0.12):
    """Straight-line walk with `step` m between frames (keyframe distance
    threshold is 0.1 m, so every frame is a keyframe)."""
    poses = []
    for i in range(n):
        p = np.eye(4)
        p[0, 3] = i * step
        poses.append(p)
    return poses


def test_default_tuples_every_keyframe():
    poses = make_trajectory()
    samples = default_dvmvs_tuples("scan", poses, [None] * len(poses), 7)
    # every frame after the first is a keyframe
    assert len(samples) == len(poses) - 1
    # references strictly increasing; sources strictly in the past
    for s in samples:
        ref = s["indices"][0]
        assert all(src < ref for src in s["indices"][1:])
        assert len(set(s["indices"])) == len(s["indices"])


def test_default_tuples_respect_buffer_distance():
    # tiny steps: distance to the LAST KEYFRAME accumulates, so a new
    # keyframe fires only every ~10 frames (0.1 m / 0.01 m per frame)
    poses = make_trajectory(n=60, step=0.01)
    samples = default_dvmvs_tuples("scan", poses, [None] * len(poses), 7)
    refs = [s["indices"][0] for s in samples]
    assert len(samples) == 5
    assert all(b - a >= 10 for a, b in zip(refs, refs[1:]))


def test_offline_tuple_uses_both_directions():
    poses = make_trajectory(n=80)
    sample = compute_offline_tuple(poses, 7, 40, poses[40].copy())
    srcs = sample["indices"][1:]
    assert any(s > 40 for s in srcs), "no future frames picked"
    assert any(s < 40 for s in srcs), "no past frames picked"


def test_dense_tuples_one_per_frame():
    poses = make_trajectory(n=40)
    samples = dense_dvmvs_tuples("scan", poses, 7)
    assert len(samples) == len(poses) - 1  # all but frame 0


def test_pad_tuple():
    import random
    random.seed(0)
    padded = pad_tuple([10, 9, 8], 8)
    assert len(padded) == 8
    assert padded[:3] == [10, 9, 8]
    # short history: repeats allowed from sources only
    padded2 = pad_tuple([1, 0], 8)
    assert len(padded2) == 8
    assert padded2[0] == 1


def test_train_chains_valid_pairwise_distance():
    poses = make_trajectory(n=100, step=0.2)  # within [0.125, 0.325]
    chains = crawl_subsequences_train(poses, subsequence_length=8)
    assert len(chains) > 0
    for chain in chains:
        assert len(chain) == 8
        assert len(set(chain)) == 8


def test_generate_tuples_cli_over_synthetic_scan(tmp_path):
    """End-to-end: synthetic ScanNet scan -> tuple file on disk."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import make_scannet_fixture
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.scripts.generate_tuples import main as gen_main

    root = str(tmp_path)
    make_scannet_fixture(root, n_frames=12)
    split_file = os.path.join(root, "split.txt")
    with open(split_file, "w") as f:
        f.write("scene0000_00\n")

    opts = Options()
    opts.dataset = "scannet"
    opts.dataset_path = root
    opts.dataset_scan_split_file = split_file
    opts.tuple_info_file_location = os.path.join(root, "gen_tuples")
    opts.mv_tuple_file_suffix = "_four_view.txt"
    opts.split = "val"
    opts.frame_tuple_type = "default"
    opts.num_images_in_tuple = 4
    opts.num_workers = 1
    gen_main(opts)

    out = os.path.join(root, "gen_tuples", "val_four_view.txt")
    assert os.path.exists(out)
    lines = [line for line in open(out) if line.strip()]
    assert len(lines) > 0
    for line in lines:
        parts = line.split()
        assert parts[0] == "scene0000_00"
        assert len(parts) == 5  # scan + 4 frame ids


def test_train_chain_consecutive_distances_and_threshold():
    """Consecutive chain frames obey the multiplier-scaled DVMVS window
    (crawl pass 1 runs at multiplier 1.0: [0.125, 0.325], t >= 0.0625)."""
    from simplerecon_tpu.data.keyframe_buffer import pose_distance

    poses = make_trajectory(n=120, step=0.2)
    chains = crawl_subsequences_train(poses, subsequence_length=8)
    assert chains, "no chains found on a crawlable trajectory"
    # multipliers used by the 10 passes
    muls = [1.0, 0.666, 1.5, 0.8, 1.25]
    lo = min(muls) * 0.125 * 0.999
    hi = max(muls) * 0.325 * 1.001
    for chain in chains:
        for a, b in zip(chain, chain[1:]):
            d, _, t = pose_distance(poses[a], poses[b])
            assert lo <= d <= hi, (a, b, d)


def test_train_export_reference_frame_is_chain_start(tmp_path):
    """frame_id_0 of each exported train tuple is the chain start, as in
    the reference's export (`generate_train_tuples.py:366-374`)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import make_scannet_fixture
    from simplerecon_tpu.data.scannet import ScannetDataset
    from simplerecon_tpu.data.tuple_generation import \
        generate_train_tuples_for_scan

    root = str(tmp_path)
    make_scannet_fixture(root, n_frames=40)
    ds = ScannetDataset(dataset_path=root, split="train",
                        mv_tuple_file_suffix=None,
                        num_images_in_tuple=4,
                        image_height=64, image_width=96)
    lines = generate_train_tuples_for_scan(ds, "scene0000_00", 4)
    for line in lines:
        parts = line.split()
        assert parts[0] == "scene0000_00"
        assert len(parts) == 5
        # chains walk monotonically in frame index: the reference frame
        # (first) is the extremum, sources strictly ordered
        ids = [int(p) for p in parts[1:]]
        assert ids == sorted(ids) or ids == sorted(ids, reverse=True)


def test_train_two_frame_variant(tmp_path):
    """num_images_in_tuple=2 routes to the gather_pairs_train crawl
    (the reference's `crawl_subprocess_short`, fixed export path)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import make_scannet_fixture
    from simplerecon_tpu.data.scannet import ScannetDataset
    from simplerecon_tpu.data.tuple_generation import \
        generate_train_tuples_for_scan
    from simplerecon_tpu.data.keyframe_buffer import pose_distance

    root = str(tmp_path)
    make_scannet_fixture(root, n_frames=40)
    ds = ScannetDataset(dataset_path=root, split="train",
                        mv_tuple_file_suffix=None,
                        num_images_in_tuple=2,
                        image_height=64, image_width=96)
    lines = generate_train_tuples_for_scan(ds, "scene0000_00", 2)
    assert lines
    for line in lines:
        parts = line.split()
        assert len(parts) == 3
    # determinism
    assert lines == generate_train_tuples_for_scan(ds, "scene0000_00", 2)
