"""Depth evaluation + optional TSDF fusion over test scans.

The canonical inference loop, mirroring `/root/reference/test.py:128-455`:
per scan, build a tuple dataset, run the jitted depth model batch by
batch, compute batched depth metrics against full-res GT (nearest
upsample, GT > 0.5 m mask), keep per-frame and per-scene averages, and
optionally fuse depths into a TSDF and export a mesh per scan.

TPU-first differences: one compiled forward serves every full batch
(static shapes; a final partial batch costs one extra compile), device
work is a single `model.apply`, and fusion runs on device as a
vectorized voxel update.

Usage:
    python -m simplerecon_tpu.scripts.test --config_file configs/...yaml \
        --data_config_file configs/data/...yaml [--run_fusion]
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.loader import DataLoader, device_prefetch
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options, OptionsHandler
from simplerecon_tpu.utils.metrics import (ResultsAverager,
                                           compute_depth_metrics_batched)


_FORWARD_KEYS = ("depth_pred_s0_bhw1", "lowest_cost_bhw",
                 "overall_mask_bhw")


def make_forward_fn(model, variables, data_parallel: bool = False):
    """Jitted inference forward; returns all depth scales + masks.

    With `data_parallel=True` and >1 device, the batch is sharded over
    the `data` mesh axis (replicated params — the serving analogue of
    the reference's multi-GPU eval, which it lacked). Partial batches
    are padded to a device multiple by repeating the last element and
    sliced back after the call.
    """
    if data_parallel and jax.device_count() > 1:
        from simplerecon_tpu.parallel import make_mesh
        from simplerecon_tpu.parallel.train import make_sharded_forward

        n_dev = jax.device_count()
        sharded = make_sharded_forward(model, variables, make_mesh())

        def forward(cur_data, src_data):
            b = cur_data["image_b3hw"].shape[0]
            pad = (-b) % n_dev

            def pad_leaf(a):
                if not pad:
                    return a
                tail = jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])
                return jnp.concatenate([a, tail], axis=0)

            out = sharded(jax.tree_util.tree_map(pad_leaf, cur_data),
                          jax.tree_util.tree_map(pad_leaf, src_data))
            return {k: out[k][:b] for k in _FORWARD_KEYS}

        return forward

    @jax.jit
    def forward(cur_data, src_data):
        outputs = model.apply(variables, cur_data, src_data, flip=False,
                              train=False, return_mask=True)
        return {k: outputs[k] for k in _FORWARD_KEYS}

    return forward


def upsample_nearest_np(depth_bhw: np.ndarray, h: int, w: int
                        ) -> np.ndarray:
    iy = (np.arange(h) * depth_bhw.shape[1] / h).astype(np.int64)
    ix = (np.arange(w) * depth_bhw.shape[2] / w).astype(np.int64)
    return depth_bhw[:, iy][:, :, ix]


def evaluate_batch(depth_pred_bhw: np.ndarray, full_gt_bhw: np.ndarray
                   ) -> Dict[str, np.ndarray]:
    """Eval protocol (`test.py:282-299`): nearest-upsample prediction to
    GT resolution, valid where GT > 0.5 m."""
    h, w = full_gt_bhw.shape[-2:]
    up = upsample_nearest_np(depth_pred_bhw, h, w)
    valid = np.isfinite(full_gt_bhw) & (full_gt_bhw > 0.5)
    return compute_depth_metrics_batched(
        jnp.asarray(full_gt_bhw), jnp.asarray(up), jnp.asarray(valid),
        mult_a=True)


def _scan_trajectory(dataset, scan):
    """(n, 4, 4) world_T_cam of every reference frame in the scan's
    tuples (for trajectory-derived TSDF bounds); None if unavailable."""
    import numpy as np
    poses = []
    for line in dataset.frame_tuples:
        parts = line.split(" ")
        if len(parts) < 2 or parts[0] != scan:
            continue
        try:
            world_T_cam, _ = dataset.load_pose(scan, parts[1])
        except Exception:
            return None
        if np.all(np.isfinite(world_T_cam)):
            poses.append(world_T_cam)
    return np.stack(poses) if poses else None


def _scan_invK(dataset, scan):
    """(invK_44, (h, w)) at the s0 scale for frustum bounds, or
    (None, None) when intrinsics are unavailable."""
    import numpy as np
    try:
        for line in dataset.frame_tuples:
            parts = line.split(" ")
            if len(parts) < 2 or parts[0] != scan:
                continue
            intr = dataset.load_intrinsics(scan, parts[1])
            invK = np.asarray(intr["invK_s0_b44"]).reshape(4, 4)
            return invK, (dataset.image_height // 2,
                          dataset.image_width // 2)
    except Exception:
        pass
    return None, None


def main(opts: Options):
    from simplerecon_tpu.utils import compile_cache
    compile_cache.enable()

    results_path = os.path.join(opts.output_base_path, opts.name,
                                opts.dataset, opts.frame_tuple_type)
    scores_dir = os.path.join(results_path, "scores")
    os.makedirs(scores_dir, exist_ok=True)
    mesh_dir = os.path.join(results_path, "meshes",
                            f"{int(opts.fusion_resolution * 100)}cm"
                            f"_{opts.fusion_max_depth}m")
    if opts.run_fusion:
        os.makedirs(mesh_dir, exist_ok=True)

    dataset_class, scans = get_dataset(
        opts.dataset, opts.dataset_scan_split_file,
        opts.single_debug_scan_id)

    model = build_depth_model(opts)
    variables = _load_or_init_variables(model, opts)
    forward = make_forward_fn(
        model, variables,
        data_parallel=getattr(opts, "data_parallel_eval", False))

    all_frame_avg = ResultsAverager(opts.name, "frame metrics")
    all_scene_avg = ResultsAverager(opts.name, "scene metrics")

    for scan in scans:
        scan_frame_avg = ResultsAverager(opts.name, f"scan {scan}")
        dataset = dataset_class(
            dataset_path=opts.dataset_path,
            split=opts.split,
            mv_tuple_file_suffix=opts.mv_tuple_file_suffix,
            tuple_info_file_location=opts.tuple_info_file_location or None,
            limit_to_scan_id=scan,
            num_images_in_tuple=opts.num_images_in_tuple
            or opts.model_num_views,
            image_height=opts.image_height, image_width=opts.image_width,
            include_full_res_depth=True, include_full_depth_K=True,
            include_high_res_color=(opts.fuse_color and opts.run_fusion),
            pass_frame_id=opts.cache_depths,
            skip_frames=opts.skip_frames, skip_to_frame=opts.skip_to_frame)
        loader = DataLoader(dataset, batch_size=opts.batch_size,
                            num_workers=opts.num_workers)

        fuser = None
        if opts.run_fusion:
            from simplerecon_tpu.fusion import get_fuser
            gt_mesh = ""
            try:
                gt_mesh = dataset.get_gt_mesh_path(opts.dataset_path,
                                                   opts.split, scan)
                if not os.path.exists(gt_mesh):
                    gt_mesh = ""
            except NotImplementedError:
                pass
            bounds = None
            if not gt_mesh:
                # size the TSDF grid from the scan's camera frustums
                # instead of the +-10 m fallback (ARKit-style unbounded
                # scans)
                from simplerecon_tpu.fusion.fusers import \
                    bounds_from_trajectory
                trajectory = _scan_trajectory(dataset, scan)
                if trajectory is not None:
                    invK, hw = _scan_invK(dataset, scan)
                    bounds = bounds_from_trajectory(
                        trajectory, opts.fusion_max_depth,
                        invK_44=invK, image_hw=hw)
            fuser = get_fuser(opts, gt_mesh, bounds_3x2=bounds)

        model_times = []
        # double-buffered H2D: batch n+1 transfers while the model runs
        # batch n (reference: pinned-memory non_blocking transfers,
        # train.py:65-94)
        for batch in device_prefetch(loader):
            cur, src = batch["cur"], batch["src"]
            b = cur["image_b3hw"].shape[0]
            device_cur = {k: v for k, v in cur.items()
                          if not isinstance(v, (list, str))}
            device_src = {k: v for k, v in src.items()
                          if not isinstance(v, (list, str))}

            t0 = time.perf_counter()
            outputs = forward(device_cur, device_src)
            depth_pred = np.asarray(outputs["depth_pred_s0_bhw1"][..., 0])
            model_times.append((time.perf_counter() - t0) / b)

            full_gt = np.asarray(cur["full_res_depth_b1hw"][:, 0])
            metrics = evaluate_batch(depth_pred, full_gt)
            for i in range(b):
                frame = {k: float(v[i]) for k, v in metrics.items()}
                frame["model_time"] = model_times[-1]
                scan_frame_avg.update_results(frame)
                all_frame_avg.update_results(frame)

            if opts.dump_depth_visualization:
                from simplerecon_tpu.utils.visualization import \
                    quick_viz_export
                viz_dir = os.path.join(results_path, "viz",
                                       "quick_viz", scan)
                host_outputs = {kk: np.asarray(vv) for kk, vv in
                                outputs.items() if vv is not None}
                for i in range(b):
                    quick_viz_export(viz_dir, host_outputs, cur,
                                     batch_ind=i, prefix=f"{scan}_{i}_")

            if opts.cache_depths:
                from simplerecon_tpu.utils.cache import cache_model_outputs
                cache_dir = os.path.join(results_path, "depths", scan)
                host_outputs = {kk: np.asarray(vv) for kk, vv in
                                outputs.items() if vv is not None}
                frame_ids = cur.get("frame_id_string",
                                    [str(i) for i in range(b)])
                cache_model_outputs(cache_dir, host_outputs, cur,
                                    src, b, frame_ids)

            if fuser is not None:
                fusion_depth = depth_pred.copy()
                if opts.fusion_use_raw_lowest_cost:
                    # np.array (copy): jax arrays are read-only views
                    fusion_depth = np.array(outputs["lowest_cost_bhw"])
                if opts.mask_pred_depth:
                    mask = np.asarray(outputs["overall_mask_bhw"])
                    fusion_depth = np.where(mask > 0.5, fusion_depth, 0.0)
                fusion_depth[fusion_depth > opts.fusion_max_depth] = 0.0
                full_h, full_w = full_gt.shape[-2:]
                up = upsample_nearest_np(fusion_depth, full_h, full_w)
                # color for the fuser (reference `test.py:364-373`):
                # high-res when the loader provides it, else model input
                color = cur.get("high_res_color_b3hw", cur["image_b3hw"]) \
                    if opts.fuse_color else None
                fuser.fuse_frames(up[:, None], cur["K_full_depth_b44"],
                                  cur["cam_T_world_b44"], color)

        if fuser is not None:
            fuser.export_mesh(os.path.join(mesh_dir, f"{scan}.ply"))

        scan_frame_avg.compute_final_average()
        scan_frame_avg.output_json(
            os.path.join(scores_dir, f"{scan}_avg_metrics.json"))
        if scan_frame_avg.final_metrics:
            all_scene_avg.update_results(scan_frame_avg.final_metrics)
        scan_frame_avg.pretty_print_results(print_running_metrics=False)

    all_frame_avg.compute_final_average()
    all_scene_avg.compute_final_average()
    all_frame_avg.output_json(
        os.path.join(scores_dir, "all_frame_avg_metrics.json"))
    all_scene_avg.output_json(
        os.path.join(scores_dir, "all_scene_avg_metrics.json"))
    print("\nPer-frame averages:")
    all_frame_avg.print_sheets_friendly(print_running_metrics=False)
    print("\nPer-scene averages:")
    all_scene_avg.print_sheets_friendly(print_running_metrics=False)
    return all_frame_avg, all_scene_avg


def _load_or_init_variables(model, opts):
    """Loads weights from a checkpoint dir (options in the checkpoint are
    authoritative for the model config — `test.py:188-195`), or random
    initializes when none is given (useful for pipeline smoke tests)."""
    import jax.random as jrandom

    from simplerecon_tpu.parallel.train import make_example_batch

    batch = make_example_batch(opts, batch_size=1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    # jitted init: eager init is pathological over a remote-TPU tunnel
    init = jax.jit(lambda r, cur, src: model.init(r, cur, src, flip=False,
                                                  train=False))
    variables = init(jrandom.PRNGKey(0), batch["cur"], batch["src"])
    ckpt = opts.load_weights_from_checkpoint
    if ckpt:
        from simplerecon_tpu.parallel.train import (init_train_state,
                                                    make_optimizer)
        from simplerecon_tpu.utils import checkpoint as ckpt_lib
        state = init_train_state(model, make_optimizer(opts),
                                 jrandom.PRNGKey(0),
                                 make_example_batch(opts, 1))
        state = ckpt_lib.load_weights(ckpt, state)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
    return variables


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    handler.pretty_print_options()
    main(opts)
