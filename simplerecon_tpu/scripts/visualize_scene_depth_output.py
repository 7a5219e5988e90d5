"""CLI: per-scene depth-output video from cached model outputs.

Counterpart of
`visualization_scripts/visualize_scene_depth_output.py:34-326`: loads the
per-frame pickles written by `--cache_depths`, assembles panels (RGB |
predicted depth | GT depth | CV argmax) and writes an mp4 per scan.

    python -m simplerecon_tpu.scripts.visualize_scene_depth_output \
        --config_file ... --data_config_file ...
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from simplerecon_tpu.data.io import reverse_imagenet_normalize_np
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.options import Options, OptionsHandler
from simplerecon_tpu.utils.cache import load_cached_output
from simplerecon_tpu.utils.visualization import (colormap_image,
                                                 normalize_depth_robust,
                                                 write_video)


def _resize_nearest(img_hw, h, w):
    iy = (np.arange(h) * img_hw.shape[0] / h).astype(np.int64)
    ix = (np.arange(w) * img_hw.shape[1] / w).astype(np.int64)
    return img_hw[iy][:, ix]


def main(opts: Options):
    results_path = os.path.join(opts.output_base_path, opts.name,
                                opts.dataset, opts.frame_tuple_type)
    cache_root = os.path.join(results_path, "depths")
    out_dir = os.path.join(results_path, "viz", "depth_videos")
    os.makedirs(out_dir, exist_ok=True)

    dataset_class, scans = get_dataset(opts.dataset,
                                       opts.dataset_scan_split_file,
                                       opts.single_debug_scan_id)

    for scan in scans:
        scan_cache = os.path.join(cache_root, scan)
        if not os.path.isdir(scan_cache):
            print(f"no cached depths for {scan} under {scan_cache}")
            continue
        dataset = dataset_class(
            dataset_path=opts.dataset_path, split=opts.split,
            mv_tuple_file_suffix=opts.mv_tuple_file_suffix,
            tuple_info_file_location=opts.tuple_info_file_location or None,
            limit_to_scan_id=scan,
            num_images_in_tuple=opts.num_images_in_tuple
            or opts.model_num_views,
            image_height=opts.image_height, image_width=opts.image_width,
            pass_frame_id=True)

        frames: List[np.ndarray] = []
        for idx in range(len(dataset)):
            cur_data, _ = dataset[idx]
            frame_id = cur_data.get("frame_id_string", str(idx))
            pickle_path = os.path.join(scan_cache, f"{frame_id}.pickle")
            if not os.path.exists(pickle_path):
                continue
            cached = load_cached_output(scan_cache, frame_id)
            depth_pred = cached["depth_pred_s0_b1hw"][0, 0]

            gt = cur_data.get("depth_b1hw")
            vmin, vmax = normalize_depth_robust(
                gt[0] if gt is not None else depth_pred)

            h, w = depth_pred.shape[-2:]
            rgb = reverse_imagenet_normalize_np(
                cur_data["image_b3hw"]).transpose(1, 2, 0)
            rgb = np.stack([_resize_nearest(rgb[..., c], h, w)
                            for c in range(3)], -1)
            panels = [rgb, colormap_image(depth_pred, vmin, vmax)]
            if gt is not None:
                panels.append(colormap_image(
                    _resize_nearest(gt[0], h, w), vmin, vmax))
            if "lowest_cost_bhw" in cached:
                panels.append(colormap_image(
                    _resize_nearest(cached["lowest_cost_bhw"][0], h, w),
                    vmin, vmax))
            frames.append(np.concatenate(panels, axis=1))

        if frames:
            out = write_video(os.path.join(out_dir, f"{scan}.mp4"),
                              frames, fps=opts.standard_fps)
            print(f"{scan}: {len(frames)} frames -> {out}")


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    main(opts)
