"""GRAND LOOP: the complete reference workflow in one command.

Runs, through the REAL CLIs and with zero external data:

  1. `scripts/train.py::main` — train the hero-architecture model from
     scratch on the rasterizer-rendered synthetic room (the shipped
     defaults: xla_fused banded sweep + "pallas_bwd" custom VJP), with
     checkpointing (reference workflow step: `/root/reference/train.py`);
  2. `scripts/test.py::main` — depth eval loading those weights + TSDF
     fusion to a mesh (`/root/reference/test.py:128-455`);
  3. mesh eval of the fused mesh against the exact GT room geometry
     (TransformerFusion protocol, `utils/mesh_metrics.py` —
     `/root/reference/README.md` mesh-eval step).

Prints one summary JSON line at the end (train loss, eval depth
metrics, mesh metrics) and writes it to <out>/grand_loop_summary.json.

    python -m simplerecon_tpu.scripts.grand_loop \
        [--steps 5000] [--out /tmp/grand_loop] [--lr 3e-4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def make_opts(args):
    from simplerecon_tpu.options import Options

    opts = Options()
    opts.name = "grand_loop"
    opts.dataset = "synthetic"
    opts.dataset_path = ""
    opts.dataset_scan_split_file = ""
    opts.single_debug_scan_id = "scene"  # the synthetic scene id
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins = 32
    opts.model_num_views = 4
    opts.num_images_in_tuple = 4
    opts.min_matching_depth = 0.25
    opts.max_matching_depth = 8.0
    opts.batch_size = args.batch
    opts.val_batch_size = args.batch
    opts.lr = args.lr
    opts.matching_norm = args.matching_norm
    return opts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="/tmp/grand_loop")
    ap.add_argument("--matching_norm", default="batch",
                    choices=["batch", "group"])
    ap.add_argument("--fusion_resolution", type=float, default=0.04)
    args = ap.parse_args()

    from simplerecon_tpu.data.synthetic import make_room_mesh
    from simplerecon_tpu.scripts import test as test_cli
    from simplerecon_tpu.scripts import train as train_cli
    from simplerecon_tpu.fusion.mesh import read_ply
    from simplerecon_tpu.utils.mesh_metrics import evaluate_mesh

    os.makedirs(args.out, exist_ok=True)
    summary = {"steps": args.steps, "lr": args.lr,
               "matching_norm": args.matching_norm}

    # ---- 1. train ----------------------------------------------------
    opts = make_opts(args)
    opts.log_dir = os.path.join(args.out, "logs")
    opts.max_steps = args.steps
    opts.log_interval = max(50, args.steps // 20)
    opts.val_interval = max(100, args.steps // 10)
    opts.val_batches = 2
    t0 = time.perf_counter()
    train_cli.main(opts)
    summary["train_seconds"] = round(time.perf_counter() - t0, 1)
    ckpt_dir = os.path.join(opts.log_dir, opts.name, "checkpoints")
    assert os.path.isdir(ckpt_dir), f"no checkpoints at {ckpt_dir}"

    # last train loss from the JSONL log
    log_path = os.path.join(opts.log_dir, opts.name, "metrics.jsonl")
    with open(log_path) as f:
        train_rows = [json.loads(line) for line in f if line.strip()]
    losses = [r.get("train/loss", r.get("loss"))
              for r in train_rows
              if "train/loss" in r or "loss" in r]
    summary["final_train_loss"] = round(float(losses[-1]), 4)

    # ---- 2. eval CLI + fusion ----------------------------------------
    opts = make_opts(args)
    opts.output_base_path = os.path.join(args.out, "eval")
    opts.split = "val"
    opts.load_weights_from_checkpoint = ckpt_dir
    opts.run_fusion = True
    opts.fusion_resolution = args.fusion_resolution
    opts.fusion_max_depth = 8.0
    t0 = time.perf_counter()
    frame_avg, _ = test_cli.main(opts)
    summary["eval_seconds"] = round(time.perf_counter() - t0, 1)
    depth_metrics = frame_avg.final_metrics
    for k in ("abs_rel", "sq_rel", "rmse", "a25", "a1"):
        if k in depth_metrics:
            summary[f"depth_{k}"] = round(float(depth_metrics[k]), 4)

    # ---- 3. mesh eval vs exact GT geometry ---------------------------
    import glob
    plys = glob.glob(os.path.join(args.out, "eval", "**", "*.ply"),
                     recursive=True)
    assert plys, "fusion produced no mesh"
    pred_v, pred_f = read_ply(plys[0])
    gt_v, gt_f, _ = make_room_mesh()
    mesh_metrics = evaluate_mesh(pred_v, pred_f, gt_v, gt_f,
                                 num_points=100_000, threshold=0.05)
    summary.update({f"mesh_{k}": round(float(v), 4)
                    for k, v in mesh_metrics.items()})

    out_path = os.path.join(args.out, "grand_loop_summary.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("GRAND_LOOP_SUMMARY " + json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
