"""CLI: evaluate reconstructed meshes against GT meshes.

Completes the mesh-metric story the reference outsourced to
TransformerFusion's eval (`/root/reference/README.md:408-413`): for each
scan, load `<mesh_dir>/<scan>.ply` and the dataset's GT mesh, sample both
at a fixed seed, and report chamfer / accuracy / completeness /
precision / recall / F-score (tau = 5 cm).

    python -m simplerecon_tpu.scripts.eval_meshes \
        --config_file ... --data_config_file ...
"""

from __future__ import annotations

import os

from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.fusion.mesh import read_ply
from simplerecon_tpu.options import Options, OptionsHandler
from simplerecon_tpu.utils.mesh_metrics import evaluate_mesh
from simplerecon_tpu.utils.metrics import ResultsAverager


def main(opts: Options):
    results_path = os.path.join(opts.output_base_path, opts.name,
                                opts.dataset, opts.frame_tuple_type)
    mesh_dir = os.path.join(results_path, "meshes",
                            f"{int(opts.fusion_resolution * 100)}cm"
                            f"_{opts.fusion_max_depth}m")
    scores_dir = os.path.join(results_path, "scores")
    os.makedirs(scores_dir, exist_ok=True)

    dataset_class, scans = get_dataset(opts.dataset,
                                       opts.dataset_scan_split_file,
                                       opts.single_debug_scan_id)
    dataset = dataset_class(
        dataset_path=opts.dataset_path, split=opts.split,
        mv_tuple_file_suffix=None,
        tuple_info_file_location=opts.tuple_info_file_location or None)

    averager = ResultsAverager(opts.name, "mesh metrics")
    for scan in scans:
        pred_path = os.path.join(mesh_dir, f"{scan}.ply")
        gt_path = dataset.get_gt_mesh_path(opts.dataset_path, opts.split,
                                           scan)
        if not os.path.exists(pred_path):
            print(f"{scan}: missing predicted mesh {pred_path}")
            continue
        if not os.path.exists(gt_path):
            print(f"{scan}: missing GT mesh {gt_path}")
            continue
        pv, pf = read_ply(pred_path)
        gv, gf = read_ply(gt_path)
        metrics = evaluate_mesh(pv, pf, gv, gf, seed=0)
        averager.update_results(metrics)
        print(f"{scan}: " + ", ".join(f"{k}={v:.4f}"
                                      for k, v in metrics.items()))

    averager.compute_final_average()
    averager.output_json(os.path.join(scores_dir, "mesh_metrics.json"))
    averager.pretty_print_results(print_running_metrics=False)
    return averager


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    main(opts)
