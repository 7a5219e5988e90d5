"""Mesh-metric tests on known geometry."""

import numpy as np

from simplerecon_tpu.utils.mesh_metrics import (compute_mesh_metrics,
                                                evaluate_mesh,
                                                sample_mesh_points)


def unit_quad(offset=0.0):
    verts = np.array([[0, 0, offset], [1, 0, offset],
                      [1, 1, offset], [0, 1, offset]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    return verts, faces


def test_sampling_covers_surface():
    verts, faces = unit_quad()
    pts = sample_mesh_points(verts, faces, 1000, seed=0)
    assert pts.shape == (1000, 3)
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
    assert np.allclose(pts[:, 2], 0)
    # roughly uniform: mean near the centroid
    assert abs(pts[:, 0].mean() - 0.5) < 0.05


def test_identical_meshes_score_perfectly():
    verts, faces = unit_quad()
    m = evaluate_mesh(verts, faces, verts, faces, num_points=5000)
    assert m["chamfer"] < 0.01
    assert m["f1"] > 0.99


def test_offset_mesh_distances():
    v1, f1 = unit_quad(0.0)
    v2, f2 = unit_quad(0.1)  # 10 cm away
    m = evaluate_mesh(v1, f1, v2, f2, num_points=5000, threshold=0.05)
    assert abs(m["acc"] - 0.1) < 0.01
    assert abs(m["comp"] - 0.1) < 0.01
    assert m["precision"] < 0.01 and m["recall"] < 0.01


def test_partial_overlap_precision_recall():
    # pred covers half of GT: perfect precision, half recall
    gt_v, gt_f = unit_quad()
    pred_v = np.array([[0, 0, 0], [0.5, 0, 0], [0.5, 1, 0], [0, 1, 0]],
                      np.float64)
    pred_f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    pred_pts = sample_mesh_points(pred_v, pred_f, 4000, 0)
    gt_pts = sample_mesh_points(gt_v, gt_f, 4000, 1)
    m = compute_mesh_metrics(pred_pts, gt_pts, threshold=0.05)
    assert m["precision"] > 0.99
    assert 0.4 < m["recall"] < 0.65


def test_eval_meshes_cli(tmp_path):
    """eval_meshes over a synthetic pred/GT mesh pair on disk."""
    import json
    import os

    from simplerecon_tpu.fusion.mesh import write_ply
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.scripts.eval_meshes import main as eval_main

    scan = "scene0000_00"
    root = str(tmp_path / "data")
    # GT mesh location follows the ScanNet layout
    gt_dir = os.path.join(root, "scans", scan)
    os.makedirs(gt_dir, exist_ok=True)
    v, f = unit_quad()
    write_ply(os.path.join(gt_dir, f"{scan}_vh_clean_2.ply"),
              v.astype(np.float32), f.astype(np.int32))

    opts = Options()
    opts.name = "mesh_eval_test"
    opts.dataset = "scannet"
    opts.dataset_path = root
    opts.split = "val"
    opts.mv_tuple_file_suffix = None
    opts.output_base_path = str(tmp_path / "out")
    split_file = str(tmp_path / "split.txt")
    open(split_file, "w").write(f"{scan}\n")
    opts.dataset_scan_split_file = split_file

    mesh_dir = os.path.join(opts.output_base_path, opts.name, "scannet",
                            "default", "meshes",
                            f"{int(opts.fusion_resolution * 100)}cm"
                            f"_{opts.fusion_max_depth}m")
    os.makedirs(mesh_dir, exist_ok=True)
    v2, f2 = unit_quad(offset=0.02)  # 2 cm off
    write_ply(os.path.join(mesh_dir, f"{scan}.ply"),
              v2.astype(np.float32), f2.astype(np.int32))

    averager = eval_main(opts)
    scores = averager.final_metrics
    assert scores and abs(scores["acc"] - 0.02) < 0.005
    out_json = os.path.join(opts.output_base_path, opts.name, "scannet",
                            "default", "scores", "mesh_metrics.json")
    assert os.path.exists(out_json)
    assert json.load(open(out_json))["scores"]["f1"] > 0.9
