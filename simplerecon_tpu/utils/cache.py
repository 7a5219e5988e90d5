"""Per-frame model-output caching.

Counterpart of `utils/generic_utils.py:241-282` (`cache_model_outputs`):
pickles each frame's predicted depth, intrinsics, pose, and source ids
under `<cache_dir>/<scan>/<frame_id>.pickle`, consumed by the
visualization scripts and `visualize_live_meshing --use_precomputed_*`.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np


def cache_model_outputs(output_path: str, outputs: Dict, cur_data: Dict,
                        src_data: Dict, batch_size: int,
                        frame_ids: List[str],
                        src_frame_ids: Optional[List[List[str]]] = None):
    os.makedirs(output_path, exist_ok=True)
    for i in range(batch_size):
        record = {
            # (1, 1, h, w): a true b1hw tensor for this single frame
            "depth_pred_s0_b1hw": np.asarray(
                outputs["depth_pred_s0_bhw1"][i, ..., 0])[None, None],
            "K_full_depth_b44": np.asarray(
                cur_data.get("K_full_depth_b44",
                             cur_data["K_s0_b44"])[i]),
            "K_s0_b44": np.asarray(cur_data["K_s0_b44"][i]),
            "world_T_cam_b44": np.asarray(cur_data["world_T_cam_b44"][i]),
            "cam_T_world_b44": np.asarray(cur_data["cam_T_world_b44"][i]),
            "frame_id": frame_ids[i],
        }
        if outputs.get("lowest_cost_bhw") is not None:
            record["lowest_cost_bhw"] = np.asarray(
                outputs["lowest_cost_bhw"][i])[None]  # (1, h, w)
        if src_frame_ids is not None:
            record["src_ids"] = src_frame_ids[i]
        with open(os.path.join(output_path, f"{frame_ids[i]}.pickle"),
                  "wb") as f:
            pickle.dump(record, f)


def load_cached_output(output_path: str, frame_id: str) -> Dict:
    with open(os.path.join(output_path, f"{frame_id}.pickle"), "rb") as f:
        return pickle.load(f)


def copy_code_state(log_dir: str, repo_root: str = None) -> str:
    """Snapshots the framework source into the log directory for
    reproducibility (`utils/generic_utils.py:15-34` in the reference).
    Copies only tracked-ish source files (*.py, *.cpp, *.yaml, *.md)."""
    import shutil

    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    dst_root = os.path.join(log_dir, "code")
    exts = (".py", ".cpp", ".yaml", ".md", ".toml")
    for dirpath, dirnames, filenames in os.walk(repo_root):
        dirnames[:] = [d for d in dirnames
                       if not d.startswith(".") and d not in
                       ("__pycache__", "outputs", "tmp")]
        for fname in filenames:
            if not fname.endswith(exts):
                continue
            src = os.path.join(dirpath, fname)
            rel = os.path.relpath(src, repo_root)
            dst = os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)
    return dst_root
