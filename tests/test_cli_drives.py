"""End-to-end drives of the eval and train CLIs on a ScanNet fixture.

These are the verify-skill drives as regression tests: tiny shapes, but
the REAL `scripts/test.py::main` / `scripts/train.py::main` loops —
loader -> device_prefetch -> jitted model/step -> metrics/fusion/
checkpointing. Nothing else in the suite executes those loops.
"""

import glob
import os

import numpy as np

from test_data import make_scannet_fixture


def _tiny_opts(root):
    from simplerecon_tpu.options import Options

    opts = Options()
    opts.dataset = "scannet"
    opts.dataset_path = root
    opts.mv_tuple_file_suffix = "_eight_view_deepvmvs.txt"
    opts.tuple_info_file_location = os.path.join(root, "tuples")
    opts.single_debug_scan_id = "scene0000_00"
    opts.dataset_scan_split_file = ""
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins = 8
    opts.model_num_views = 4
    opts.num_images_in_tuple = 4
    opts.batch_size = 2
    opts.num_workers = 1
    opts.precision = "32"
    return opts


def test_eval_cli_end_to_end(tmp_path):
    from simplerecon_tpu.scripts import test as test_cli

    root = make_scannet_fixture(str(tmp_path), n_frames=4)
    opts = _tiny_opts(root)
    opts.name = "drive_eval"
    opts.output_base_path = os.path.join(root, "out")
    opts.split = "val"
    opts.run_fusion = True
    opts.fusion_resolution = 0.2

    frame_avg, _ = test_cli.main(opts)
    m = frame_avg.final_metrics
    assert m and np.isfinite(m["abs_rel"])
    scores = glob.glob(os.path.join(root, "out", "**",
                                    "all_frame_avg_metrics.json"),
                       recursive=True)
    assert scores, "metrics JSON not written"
    plys = glob.glob(os.path.join(root, "out", "**", "*.ply"),
                     recursive=True)
    assert plys, "fusion mesh not exported"


def test_train_cli_end_to_end(tmp_path):
    from simplerecon_tpu.scripts import train as train_cli

    root = make_scannet_fixture(str(tmp_path), n_frames=4)
    opts = _tiny_opts(root)
    opts.name = "drive_train"
    opts.log_dir = os.path.join(root, "logs")
    opts.val_batch_size = 2
    opts.max_steps = 4
    opts.log_interval = 2
    opts.val_interval = 4
    opts.val_batches = 1
    opts.checkpoint_interval = 4
    train_cli.main(opts)

    ckpts = glob.glob(os.path.join(root, "logs", "drive_train",
                                   "**", "checkpoint*"), recursive=True)
    assert ckpts, "no checkpoint written"
    logs = glob.glob(os.path.join(root, "logs", "drive_train", "**",
                                  "*.jsonl"), recursive=True)
    assert logs, "no metrics log written"
