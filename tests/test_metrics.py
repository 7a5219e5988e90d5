"""Depth-metric and ResultsAverager tests (golden values by hand)."""

import json

import numpy as np

from simplerecon_tpu.utils.metrics import (ResultsAverager,
                                           compute_depth_metrics,
                                           compute_depth_metrics_batched)


def test_perfect_prediction():
    gt = np.full((1, 4, 4), 2.0, np.float32)
    m = compute_depth_metrics_batched(gt, gt, np.ones_like(gt, bool))
    assert np.isclose(float(m["abs_diff"][0]), 0.0)
    assert np.isclose(float(m["rmse"][0]), 0.0)
    assert np.isclose(float(m["a5"][0]), 1.0)


def test_known_values():
    gt = np.full((2, 2), 2.0, np.float32)
    pred = np.full((2, 2), 2.2, np.float32)
    m = compute_depth_metrics(gt, pred, np.ones_like(gt, bool), mult_a=True)
    assert np.isclose(m["abs_diff"], 0.2, atol=1e-6)
    assert np.isclose(m["abs_rel"], 0.1, atol=1e-6)
    assert np.isclose(m["sq_rel"], 0.04 / 2.0, atol=1e-6)
    assert np.isclose(m["rmse"], 0.2, atol=1e-6)
    # ratio 1.1: fails a5, passes a25; percentages (mult_a)
    assert np.isclose(m["a5"], 0.0)
    assert np.isclose(m["a25"], 100.0)


def test_mask_and_empty_frames():
    gt = np.stack([np.full((2, 2), 2.0, np.float32),
                   np.full((2, 2), 2.0, np.float32)])
    pred = np.stack([np.array([[2.0, 99.0], [2.0, 99.0]], np.float32),
                     np.full((2, 2), 2.0, np.float32)])
    mask = np.stack([np.array([[True, False], [True, False]]),
                     np.zeros((2, 2), bool)])
    m = compute_depth_metrics_batched(gt, pred, mask)
    assert np.isclose(float(m["abs_diff"][0]), 0.0)  # bad pixels masked
    assert np.isnan(float(m["abs_diff"][1]))         # empty frame -> NaN


def test_results_averager(tmp_path):
    avg = ResultsAverager("exp", "frame metrics")
    avg.update_results({"abs_diff": 1.0, "rmse": 2.0})
    avg.update_results({"abs_diff": 3.0, "rmse": 4.0})
    avg.update_results({"abs_diff": float("nan"), "rmse": 1.0})  # skipped
    assert np.isclose(avg.running_metrics["abs_diff"], 2.0)
    final = avg.compute_final_average()
    assert np.isclose(final["rmse"], 3.0)
    out = tmp_path / "scores.json"
    avg.output_json(str(out))
    data = json.loads(out.read_text())
    assert np.isclose(data["scores"]["abs_diff"], 2.0)
