"""CLI: incremental reconstruction video (live meshing).

Counterpart of `/root/reference/visualize_live_meshing.py:27-372`: per
keyframe tuple (batch forced to 1), predict depth, fuse into the TSDF,
extract the partial mesh, render an FPV view and a smoothed bird's-eye
view with the native rasterizer, and write videos.

    python -m simplerecon_tpu.scripts.visualize_live_meshing \
        --config_file ... --data_config_file ... [--use_precomputed_partial_meshes]
"""

from __future__ import annotations

import os
from typing import List

import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.loader import DataLoader
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.fusion import get_fuser
from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options, OptionsHandler
from simplerecon_tpu.render import Renderer, SmoothBirdsEyeCamera
from simplerecon_tpu.scripts.test import (_load_or_init_variables,
                                          make_forward_fn,
                                          upsample_nearest_np)
from simplerecon_tpu.utils.visualization import (colormap_image,
                                                 write_video)


def main(opts: Options):
    out_dir = os.path.join(opts.output_base_path, opts.name, opts.dataset,
                           opts.frame_tuple_type, "live_meshing")
    os.makedirs(out_dir, exist_ok=True)

    dataset_class, scans = get_dataset(opts.dataset,
                                       opts.dataset_scan_split_file,
                                       opts.single_debug_scan_id)
    model = build_depth_model(opts)
    variables = _load_or_init_variables(model, opts)
    forward = make_forward_fn(model, variables)
    renderer = Renderer(opts.viz_render_height, opts.viz_render_width)

    for scan in scans:
        dataset = dataset_class(
            dataset_path=opts.dataset_path, split=opts.split,
            mv_tuple_file_suffix=opts.mv_tuple_file_suffix,
            tuple_info_file_location=opts.tuple_info_file_location or None,
            limit_to_scan_id=scan,
            num_images_in_tuple=opts.num_images_in_tuple
            or opts.model_num_views,
            image_height=opts.image_height, image_width=opts.image_width,
            include_full_depth_K=True, pass_frame_id=opts.cache_depths)
        # live meshing is online: batch forced to 1
        # (`visualize_live_meshing.py:28-29`)
        loader = DataLoader(dataset, batch_size=1,
                            num_workers=opts.num_workers)
        from simplerecon_tpu.scripts.test import _scan_trajectory
        fuser = get_fuser(
            opts, "", trajectory_world_T_cam=_scan_trajectory(dataset,
                                                              scan))
        birdseye = SmoothBirdsEyeCamera()

        # reuse cached per-frame depths when available (the reference's
        # cached-depth path, `visualize_live_meshing.py:90-130`)
        cache_dir = os.path.join(opts.output_base_path, opts.name,
                                 opts.dataset, opts.frame_tuple_type,
                                 "depths", scan)

        fpv_frames: List[np.ndarray] = []
        bird_frames: List[np.ndarray] = []
        frame_index = -1
        for batch in loader:
            frame_index += 1
            cur, src = batch["cur"], batch["src"]

            cached = None
            if opts.cache_depths:
                fid = cur.get("frame_id_string", [str(frame_index)])[0]
                pickle_path = os.path.join(cache_dir, f"{fid}.pickle")
                if os.path.exists(pickle_path):
                    from simplerecon_tpu.utils.cache import \
                        load_cached_output
                    cached = load_cached_output(cache_dir, fid)

            if cached is not None:
                depth = np.array(cached["depth_pred_s0_b1hw"][:, 0])
            else:
                device_cur = {k: jnp.asarray(v) for k, v in cur.items()
                              if isinstance(v, np.ndarray)}
                device_src = {k: jnp.asarray(v) for k, v in src.items()
                              if isinstance(v, np.ndarray)}
                outputs = forward(device_cur, device_src)
                # np.array (copy): asarray of a jax array is read-only
                depth = np.array(outputs["depth_pred_s0_bhw1"][..., 0])
            depth[depth > opts.fusion_max_depth] = 0.0

            # fuse at the prediction's own (s0) resolution with the
            # matching intrinsics — TSDF integration is resolution-
            # agnostic (test.py uses the full-res path for eval parity)
            K_s0 = np.asarray(cur["K_s0_b44"][0])
            K_full = np.asarray(cur["K_full_depth_b44"][0])
            world_T_cam = np.asarray(cur["world_T_cam_b44"][0])
            color = cur["image_b3hw"] if opts.fuse_color else None
            fuser.fuse_frames(depth[:, None], K_s0[None],
                              np.asarray(cur["cam_T_world_b44"]), color)

            verts, faces = fuser.get_mesh()
            if len(verts) == 0:
                continue
            K_render = K_full.copy()
            K_render[0] *= opts.viz_render_width / (2 * K_full[0, 2])
            K_render[1] *= opts.viz_render_height / (2 * K_full[1, 2])
            fpv_rgb, _ = renderer.render_mesh(verts, faces, world_T_cam,
                                              K_render)
            # depth billboard in the corner
            dh = opts.viz_render_height // 4
            dw = opts.viz_render_width // 4
            dsmall = upsample_nearest_np(depth, dh, dw)[0]
            panel = colormap_image(dsmall, 0.5, opts.fusion_max_depth)
            fpv = fpv_rgb.astype(np.float32) / 255.0
            fpv[:dh, -dw:] = panel
            fpv_frames.append(fpv)

            bird_pose = birdseye.get_bird_eye_trans(world_T_cam)
            bird_rgb, _ = renderer.render_mesh(
                verts, faces, bird_pose, K_render,
                back_face_alpha=opts.back_face_alpha)
            bird_frames.append(bird_rgb.astype(np.float32) / 255.0)

        if fpv_frames:
            write_video(os.path.join(out_dir, f"{scan}_fpv.mp4"),
                        fpv_frames, fps=opts.standard_fps)
            write_video(os.path.join(out_dir, f"{scan}_birdseye.mp4"),
                        bird_frames, fps=opts.standard_fps)
            print(f"{scan}: wrote {len(fpv_frames)} frames")


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    main(opts)
