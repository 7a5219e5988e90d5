"""Visualization helper tests."""

import numpy as np

from simplerecon_tpu.utils.visualization import (colormap_image,
                                                 normalize_depth_robust,
                                                 quick_viz_export,
                                                 turbo_colormap)


def test_turbo_colormap_range_and_ends():
    x = np.linspace(0, 1, 11)
    rgb = turbo_colormap(x)
    assert rgb.shape == (11, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # turbo: blue-dominant low, red-dominant high
    low = turbo_colormap(np.array(0.2))
    assert low[2] > low[0]
    assert rgb[-1, 0] > rgb[-1, 2]


def test_colormap_image_invalid_pixels():
    d = np.full((4, 4), 2.0, np.float32)
    d[0, 0] = np.nan
    img = colormap_image(d, vmin=1.0, vmax=3.0)
    np.testing.assert_allclose(img[0, 0], (0.47, 0.47, 0.47), atol=1e-6)
    assert np.isfinite(img).all()


def test_normalize_depth_robust():
    d = np.concatenate([np.full(98, 2.0), [0.0, 100.0]])
    vmin, vmax = normalize_depth_robust(d.reshape(10, 10))
    assert 0.0 <= vmin <= 2.0 and 2.0 <= vmax <= 100.0
    assert vmax - vmin < 50  # outliers trimmed


def test_quick_viz_export(tmp_path):
    rng = np.random.RandomState(0)
    outputs = {"depth_pred_s0_bhw1": rng.rand(1, 8, 8, 1).astype(
        np.float32), "lowest_cost_bhw": rng.rand(1, 8, 8)}
    cur = {"image_b3hw": rng.randn(1, 3, 16, 16).astype(np.float32),
           "depth_b1hw": (1 + rng.rand(1, 1, 8, 8)).astype(np.float32)}
    files = quick_viz_export(str(tmp_path), outputs, cur)
    assert len(files) == 4
    import os
    assert all(os.path.exists(f) for f in files)
