"""CLI: depth inference + multi-view-consistency point-cloud fusion.

Counterpart of `/root/reference/pc_fusion.py:34-172`: per scan, predict
depth for every tuple, clamp depths beyond 3 m to 0, upsample to the
full depth resolution, then run the 3DVNet consistency fuser and write a
PLY point cloud.

    python -m simplerecon_tpu.scripts.pc_fusion --config_file ... \
        --data_config_file ...
"""

from __future__ import annotations

import os
from typing import List

import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.loader import DataLoader
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.fusion.mesh import write_ply
from simplerecon_tpu.fusion.point_cloud import process_scene
from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options, OptionsHandler
from simplerecon_tpu.scripts.test import (_load_or_init_variables,
                                          make_forward_fn,
                                          upsample_nearest_np)
from simplerecon_tpu.data.io import reverse_imagenet_normalize_np


def main(opts: Options):
    out_dir = os.path.join(opts.output_base_path, opts.name, opts.dataset,
                           opts.frame_tuple_type, "pc_fusion")
    os.makedirs(out_dir, exist_ok=True)

    dataset_class, scans = get_dataset(opts.dataset,
                                       opts.dataset_scan_split_file,
                                       opts.single_debug_scan_id)
    model = build_depth_model(opts)
    variables = _load_or_init_variables(model, opts)
    forward = make_forward_fn(model, variables)

    for scan in scans:
        dataset = dataset_class(
            dataset_path=opts.dataset_path, split=opts.split,
            mv_tuple_file_suffix=opts.mv_tuple_file_suffix,
            tuple_info_file_location=opts.tuple_info_file_location or None,
            limit_to_scan_id=scan,
            num_images_in_tuple=opts.num_images_in_tuple
            or opts.model_num_views,
            image_height=opts.image_height, image_width=opts.image_width,
            include_full_depth_K=True)
        loader = DataLoader(dataset, batch_size=opts.batch_size,
                            num_workers=opts.num_workers)

        depths: List[np.ndarray] = []
        poses: List[np.ndarray] = []
        Ks: List[np.ndarray] = []
        colors: List[np.ndarray] = []
        for batch in loader:
            cur = batch["cur"]
            device_cur = {k: jnp.asarray(v) for k, v in cur.items()
                          if isinstance(v, np.ndarray)}
            device_src = {k: jnp.asarray(v)
                          for k, v in batch["src"].items()
                          if isinstance(v, np.ndarray)}
            outputs = forward(device_cur, device_src)
            # np.array (copy): asarray of a jax array is read-only
            pred = np.array(outputs["depth_pred_s0_bhw1"][..., 0])
            pred[pred > opts.fusion_max_depth] = 0.0  # (`pc_fusion.py:118`)
            for i in range(pred.shape[0]):
                depths.append(pred[i])
                poses.append(np.asarray(cur["world_T_cam_b44"][i]))
                Ks.append(np.asarray(cur["K_s0_b44"][i]))
                rgb = reverse_imagenet_normalize_np(
                    np.asarray(cur["image_b3hw"][i]))
                colors.append(rgb)

        if not depths:
            continue
        K_f = np.stack(Ks)
        invK_f = np.stack([np.linalg.inv(k) for k in Ks])
        # color sampled at depth resolution
        dh, dw = depths[0].shape
        colors_small = np.stack(
            [upsample_nearest_np(c, dh, dw) for c in colors])
        points, cols = process_scene(
            np.stack(depths), np.stack(poses), K_f, invK_f,
            colors_f3hw=colors_small,
            z_thresh=opts.pc_fusion_z_thresh,
            n_consistent=opts.n_consistent_thresh,
            voxel_downsample_size=opts.voxel_downsample)
        out = os.path.join(out_dir, f"{scan}.ply")
        write_ply(out, points, np.zeros((0, 3), np.int32), colors=cols)
        print(f"{scan}: {len(points)} fused points -> {out}")


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    main(opts)
