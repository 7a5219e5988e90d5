"""Online streaming session: keyframe gating + jitted forward."""

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.online import OnlineSession
from simplerecon_tpu.options import Options
from simplerecon_tpu.parallel.train import make_example_batch


def test_online_session_streams():
    opts = Options()
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins, opts.model_num_views = 8, 3
    model = build_depth_model(opts)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_example_batch(opts, 1))
    variables = model.init(jax.random.PRNGKey(0), batch["cur"],
                           batch["src"], flip=False, train=False)

    session = OnlineSession(opts, variables, model=model)
    rng = np.random.RandomState(0)
    m = opts.matching_scale
    K = np.asarray(batch["src"][f"K_s{m}_b44"])[0, 0]
    invK = np.linalg.inv(K)

    results = []
    for i in range(6):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.15 * i  # every step > keyframe distance 0.1
        frame = {
            "image_b3hw": rng.randn(3, 64, 96).astype(np.float32),
            "world_T_cam_b44": pose,
            "cam_T_world_b44": np.linalg.inv(pose),
            f"K_s{m}_b44": K.astype(np.float32),
            f"invK_s{m}_b44": invK.astype(np.float32),
        }
        results.append(session.process_frame(frame))

    # frame 0 primes the buffer (no prediction); the rest are keyframes
    assert results[0] is None
    produced = [r for r in results if r is not None]
    assert len(produced) == 5
    depth = produced[0]["depth_pred_s0_bhw1"]
    assert depth.shape == (1, 32, 48, 1)
    assert np.isfinite(depth).all()


def test_online_session_skips_close_frames():
    opts = Options()
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins, opts.model_num_views = 8, 3
    model = build_depth_model(opts)
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_example_batch(opts, 1))
    variables = model.init(jax.random.PRNGKey(0), batch["cur"],
                           batch["src"], flip=False, train=False)
    session = OnlineSession(opts, variables, model=model)
    m = opts.matching_scale
    K = np.asarray(batch["src"][f"K_s{m}_b44"])[0, 0]
    frame = {
        "image_b3hw": np.zeros((3, 64, 96), np.float32),
        "world_T_cam_b44": np.eye(4, dtype=np.float32),
        "cam_T_world_b44": np.eye(4, dtype=np.float32),
        f"K_s{m}_b44": K.astype(np.float32),
        f"invK_s{m}_b44": np.linalg.inv(K).astype(np.float32),
    }
    # identical poses: never far enough from the last keyframe
    assert session.process_frame(dict(frame)) is None
    assert session.process_frame(dict(frame)) is None
    assert session.process_frame(dict(frame)) is None
