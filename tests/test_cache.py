"""Output-cache layout regression tests (b1hw means (1, 1, h, w))."""

import numpy as np

from simplerecon_tpu.utils.cache import cache_model_outputs, \
    load_cached_output


def test_cache_roundtrip_shapes(tmp_path):
    rng = np.random.RandomState(0)
    outputs = {
        "depth_pred_s0_bhw1": rng.rand(2, 8, 12, 1).astype(np.float32),
        "lowest_cost_bhw": rng.rand(2, 8, 12).astype(np.float32),
    }
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4))
    cur = {"K_s0_b44": eye.copy(), "world_T_cam_b44": eye.copy(),
           "cam_T_world_b44": eye.copy()}
    cache_model_outputs(str(tmp_path), outputs, cur, {}, 2, ["a", "b"])

    rec = load_cached_output(str(tmp_path), "b")
    assert rec["depth_pred_s0_b1hw"].shape == (1, 1, 8, 12)
    assert rec["lowest_cost_bhw"].shape == (1, 8, 12)
    np.testing.assert_allclose(rec["depth_pred_s0_b1hw"][0, 0],
                               outputs["depth_pred_s0_bhw1"][1, ..., 0])
    assert rec["frame_id"] == "b"
