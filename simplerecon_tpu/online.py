"""Online (streaming) inference: keyframe buffer + jitted depth model.

The reference's real-time surface is `visualize_live_meshing.py` +
`KeyframeBuffer` (`tools/keyframe_buffer.py:72-186`): frames arrive one
at a time, the buffer decides which are keyframes, and each keyframe is
matched against the best buffered source views. This module packages
that as a reusable API:

    session = OnlineSession(opts, variables)
    for frame in stream:                       # dict per frame
        result = session.process_frame(frame)
        if result is not None:                 # keyframe -> depth map
            fuse(result["depth_pred_s0_bhw1"], ...)

Device work is one fixed-shape jitted forward; when fewer source views
than `model_num_views - 1` are buffered, the most recent sources are
repeated (static shapes — the tuple generators pad the same way,
`generate_test_tuples.py:480-515`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.keyframe_buffer import DVMVS_Config, KeyframeBuffer


class OnlineSession:
    """Streaming depth estimation over a posed RGB stream.

    Args:
        opts: Options (model geometry, keyframe thresholds).
        model: a DepthModel (built via build_depth_model if omitted).
        variables: model variables ({"params", "batch_stats"}).

    `process_frame(frame)` expects a dict with:
        image_b3hw      (3, h, w) imagenet-normalized image
        world_T_cam_b44 / cam_T_world_b44  (4, 4)
        K_s{m}_b44 / invK_s{m}_b44 at the matching scale m
        dist_to_last_valid (optional int) tracking-loss hint
    """

    def __init__(self, opts, variables, model=None):
        from simplerecon_tpu.models.depth_model import build_depth_model
        self.opts = opts
        self.model = model or build_depth_model(opts)
        self.variables = variables
        self.num_sources = opts.model_num_views - 1
        self.buffer = KeyframeBuffer(
            buffer_size=opts.test_keyframe_buffer_size,
            keyframe_pose_distance=DVMVS_Config.test_keyframe_pose_distance,
            optimal_t_score=DVMVS_Config.test_optimal_t_measure,
            optimal_R_score=DVMVS_Config.test_optimal_R_measure,
            store_return_indices=False)
        self._frame_count = 0

        @jax.jit
        def forward(variables, cur_data, src_data):
            out = self.model.apply(variables, cur_data, src_data,
                                   flip=False, train=False,
                                   return_mask=True)
            return {k: v for k, v in out.items() if v is not None}

        self._forward = forward

    def process_frame(self, frame: Dict[str, np.ndarray]
                      ) -> Optional[Dict[str, np.ndarray]]:
        """Feeds one frame; returns model outputs when it's a keyframe
        with at least one source view available, else None."""
        self._frame_count += 1
        response = self.buffer.try_new_keyframe(
            np.asarray(frame["world_T_cam_b44"], np.float64),
            frame, frame.get("dist_to_last_valid"))
        if response != 1:
            return None
        sources = self.buffer.get_best_measurement_frames(self.num_sources)
        src_frames = [s[1] for s in sources]
        if not src_frames:
            return None
        while len(src_frames) < self.num_sources:  # pad (static shapes)
            src_frames.append(src_frames[-1])

        m = self.opts.matching_scale
        cur_data = {
            "image_b3hw": jnp.asarray(frame["image_b3hw"])[None],
            f"invK_s{m}_b44": jnp.asarray(frame[f"invK_s{m}_b44"])[None],
            "world_T_cam_b44": jnp.asarray(frame["world_T_cam_b44"])[None],
            "cam_T_world_b44": jnp.asarray(frame["cam_T_world_b44"])[None],
        }
        src_data = {
            "image_b3hw": jnp.stack(
                [jnp.asarray(f["image_b3hw"]) for f in src_frames])[None],
            f"K_s{m}_b44": jnp.stack(
                [jnp.asarray(f[f"K_s{m}_b44"]) for f in src_frames])[None],
            "world_T_cam_b44": jnp.stack(
                [jnp.asarray(f["world_T_cam_b44"])
                 for f in src_frames])[None],
            "cam_T_world_b44": jnp.stack(
                [jnp.asarray(f["cam_T_world_b44"])
                 for f in src_frames])[None],
        }
        outputs = self._forward(self.variables, cur_data, src_data)
        return {k: np.asarray(v) for k, v in outputs.items()}
