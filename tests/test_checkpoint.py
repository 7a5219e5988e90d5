"""Checkpoint save/resume/strip round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options
from simplerecon_tpu.parallel.train import (init_train_state,
                                            make_example_batch,
                                            make_optimizer)
from simplerecon_tpu.utils import checkpoint as ckpt


def tiny_opts():
    opts = Options()
    opts.image_height = 64
    opts.image_width = 96
    opts.matching_num_depth_bins = 8
    opts.model_num_views = 3
    return opts


def make_state(opts, seed=0):
    model = build_depth_model(opts)
    optimizer = make_optimizer(opts)
    return init_train_state(model, optimizer, jax.random.PRNGKey(seed),
                            make_example_batch(opts, 1))


def test_save_restore_roundtrip(tmp_path):
    opts = tiny_opts()
    state = make_state(opts)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt.save_checkpoint(str(tmp_path), state, opts)
    assert ckpt.latest_step(str(tmp_path)) == 7

    target = make_state(opts, seed=1)  # different weights
    target = target.replace(step=jnp.asarray(0, jnp.int32))
    restored = ckpt.restore_checkpoint(str(tmp_path), target)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    ropts = ckpt.load_options_from_checkpoint(str(tmp_path))
    assert ropts.image_height == 64 and ropts.model_num_views == 3


def test_weights_only_load_keeps_opt_state(tmp_path):
    opts = tiny_opts()
    src = make_state(opts).replace(step=jnp.asarray(5, jnp.int32))
    ckpt.save_checkpoint(str(tmp_path), src, opts)

    fresh = make_state(opts, seed=2)
    loaded = ckpt.load_weights(str(tmp_path), fresh)
    assert int(loaded.step) == 0  # step NOT restored
    a = jax.tree_util.tree_leaves(src.params)
    b = jax.tree_util.tree_leaves(loaded.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_rotation(tmp_path):
    opts = tiny_opts()
    state = make_state(opts)
    for s in (1, 2, 3):
        ckpt.save_checkpoint(str(tmp_path), state.replace(
            step=jnp.asarray(s, jnp.int32)), opts, keep=2)
    import os
    dirs = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_"))
    assert dirs == ["step_2", "step_3"]
