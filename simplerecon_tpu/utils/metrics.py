"""Depth-eval metrics and results averaging.

Re-creates `utils/metrics_utils.py` from the reference:

  * `compute_depth_metrics` / `compute_depth_metrics_batched`
    (`utils/metrics_utils.py:7-120`): abs_diff, abs_rel, sq_rel, rmse,
    rmse_log and inlier ratios delta < 1.05/1.10/1.25/1.25^2/1.25^3
    (ratios reported as percentages, matching the reference's
    `a5 = (thresh < 1.05).float().mean() * 100` convention).
  * `ResultsAverager` (`utils/metrics_utils.py:122-293`): running +
    exact final averaging of metric dicts with JSON export.

The batched variant is jit-friendly: invalid pixels are excluded with an
explicit mask (the reference NaN-fills and uses `nanmean`) and per-frame
means are computed with masked sums. Frames with no valid pixels produce
NaN rows, which `ResultsAverager` skips — the same net behavior as the
reference's nanmean + `both_avg` skipping.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

METRIC_NAMES = ("abs_diff", "abs_rel", "sq_rel", "rmse", "rmse_log",
                "a5", "a10", "a25", "a0", "a1", "a2", "a3")


def compute_depth_metrics_batched(depth_gt_bhw: jnp.ndarray,
                                  depth_pred_bhw: jnp.ndarray,
                                  valid_mask_bhw: jnp.ndarray,
                                  mult_a: bool = False
                                  ) -> Dict[str, jnp.ndarray]:
    """Per-frame depth metrics over masked pixels. Returns (b,) arrays.

    `mult_a=True` multiplies inlier ratios by 100 (the reference's test.py
    path uses the percentage convention from `compute_depth_metrics`).
    Frames whose mask is empty yield NaN.
    """
    gt = depth_gt_bhw.astype(jnp.float32)
    pred = depth_pred_bhw.astype(jnp.float32)
    mask = valid_mask_bhw & jnp.isfinite(gt) & (gt > 0)
    gt_safe = jnp.where(mask, gt, 1.0)
    pred_safe = jnp.where(mask, jnp.maximum(pred, 1e-6), 1.0)

    count = jnp.sum(mask, axis=(1, 2)).astype(jnp.float32)
    empty = count == 0
    denom = jnp.maximum(count, 1.0)

    def fmean(x_bhw):
        s = jnp.sum(jnp.where(mask, x_bhw, 0.0), axis=(1, 2)) / denom
        return jnp.where(empty, jnp.nan, s)

    thresh = jnp.maximum(gt_safe / pred_safe, pred_safe / gt_safe)
    diff = pred_safe - gt_safe
    log_diff = jnp.log(pred_safe) - jnp.log(gt_safe)

    scale = 100.0 if mult_a else 1.0
    metrics = {
        "abs_diff": fmean(jnp.abs(diff)),
        "abs_rel": fmean(jnp.abs(diff) / gt_safe),
        "sq_rel": fmean(diff ** 2 / gt_safe),
        "rmse": jnp.sqrt(fmean(diff ** 2)),
        "rmse_log": jnp.sqrt(fmean(log_diff ** 2)),
        "a5": fmean((thresh < 1.05).astype(jnp.float32)) * scale,
        "a10": fmean((thresh < 1.10).astype(jnp.float32)) * scale,
        "a25": fmean((thresh < 1.25).astype(jnp.float32)) * scale,
        "a0": fmean((thresh < 1.25).astype(jnp.float32)) * scale,
        "a1": fmean((thresh < 1.25 ** 2).astype(jnp.float32)) * scale,
        "a2": fmean((thresh < 1.25 ** 3).astype(jnp.float32)) * scale,
        "a3": fmean((thresh < 1.25 ** 4).astype(jnp.float32)) * scale,
    }
    return metrics


def compute_depth_metrics(depth_gt_hw, depth_pred_hw, valid_mask_hw,
                          mult_a: bool = True) -> Dict[str, float]:
    """Single-frame convenience wrapper (`utils/metrics_utils.py:7-50`)."""
    out = compute_depth_metrics_batched(
        jnp.asarray(depth_gt_hw)[None], jnp.asarray(depth_pred_hw)[None],
        jnp.asarray(valid_mask_hw)[None], mult_a=mult_a)
    return {k: float(v[0]) for k, v in out.items()}


class ResultsAverager:
    """Running + exact averaging of metric dicts
    (`utils/metrics_utils.py:122-293`)."""

    def __init__(self, exp_name: str = "", metrics_name: str = ""):
        self.exp_name = exp_name
        self.metrics_name = metrics_name
        self.elem_metrics: List[Dict[str, float]] = []
        self.running_metrics: Optional[Dict[str, float]] = None
        self.running_count = 0
        self.final_metrics: Optional[Dict[str, float]] = None

    def update_results(self, elem_metrics: Dict[str, float]):
        elem = {k: float(v) for k, v in elem_metrics.items()}
        if any(np.isnan(v) for v in elem.values()):
            return  # skip frames with no valid pixels
        self.elem_metrics.append(dict(elem))
        if self.running_metrics is None:
            self.running_metrics = dict(elem)
        else:
            for k, v in elem.items():
                self.running_metrics[k] = (
                    self.running_metrics[k] * self.running_count + v
                ) / (self.running_count + 1)
        self.running_count += 1

    def compute_final_average(self, ignore_nans: bool = False
                              ) -> Dict[str, float]:
        self.final_metrics = {}
        if not self.elem_metrics:
            return self.final_metrics
        keys = self.elem_metrics[0].keys()
        for k in keys:
            vals = np.array([e[k] for e in self.elem_metrics], np.float64)
            self.final_metrics[k] = float(
                np.nanmean(vals) if ignore_nans else np.mean(vals))
        return self.final_metrics

    def print_sheets_friendly(self, include_metrics_names: bool = True,
                              print_running_metrics: bool = True):
        metrics = (self.running_metrics if print_running_metrics
                   else self.final_metrics) or {}
        print(f"Results: {self.exp_name}, {self.metrics_name}")
        if include_metrics_names:
            print(",".join(metrics.keys()))
        print(",".join(f"{v:.4f}" for v in metrics.values()))

    def pretty_print_results(self, print_running_metrics: bool = True):
        metrics = (self.running_metrics if print_running_metrics
                   else self.final_metrics) or {}
        print(f"Results: {self.exp_name}, {self.metrics_name}")
        for k, v in metrics.items():
            print(f"{k}: {v:.4f}")

    def output_json(self, filepath: str, print_running_metrics: bool = False):
        metrics = (self.running_metrics if print_running_metrics
                   else self.final_metrics) or {}
        payload = {
            "exp_name": self.exp_name,
            "metrics_type": self.metrics_name,
            "scores": metrics,
        }
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        with open(filepath, "w") as f:
            json.dump(payload, f, indent=2)
