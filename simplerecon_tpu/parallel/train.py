"""Jitted, mesh-sharded train/eval steps.

Replaces the reference's Lightning `training_step`/`configure_optimizers`
(`experiment_modules/depth_model.py:502-633`, `train.py:124-145`):

  * optax AdamW with the reference's piecewise LR drops
    (x0.1 at 70k, x0.1 again at 80k — `depth_model.py:615-633`).
  * one jitted SPMD program over a `data`-axis mesh; gradients are
    reduced by XLA-inserted `psum` when the batch is sharded and the
    params are replicated (the DDP equivalent, SURVEY.md §2.6).
  * bf16 compute / fp32 params & optimizer state (the AMP equivalent);
    pose math and losses stay fp32 inside the model/loss code.
  * the per-batch horizontal-flip coin and the flip-in/flip-out
    discipline live inside the step (`depth_model.py:336-341`).

Batch schema (see `make_example_batch`): a `{"cur": ..., "src": ...}` dict
of arrays following the reference's key naming; GT depth is at s0
resolution (half the input image), as the reference's dataloader provides.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from simplerecon_tpu import losses as loss_lib
from simplerecon_tpu.ops import geometry as geo
from simplerecon_tpu.parallel.mesh import (batch_sharding,
                                           replicated_sharding,
                                           shard_map_nocheck)

logger = logging.getLogger(__name__)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(opts) -> optax.Schedule:
    """Stepped LR: x0.1 at each boundary (70k, 80k by default), matching
    the reference's LambdaLR (`depth_model.py:615-633`)."""
    return optax.piecewise_constant_schedule(
        init_value=opts.lr,
        boundaries_and_scales={int(s): 0.1 for s in opts.lr_steps})


def make_optimizer(opts) -> optax.GradientTransformation:
    """AdamW + stepped LR, wrapped so non-finite gradient batches are
    SKIPPED instead of silently poisoning the params (observed: a bad
    batch can NaN the predictions, after which every masked loss term
    zeroes out and training walks on dead). Optional global-norm clip
    via `opts.grad_clip` (off by default, matching the reference)."""
    tx = optax.adamw(make_lr_schedule(opts), weight_decay=opts.wd)
    clip = float(getattr(opts, "grad_clip", 0.0) or 0.0)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return optax.apply_if_finite(tx, max_consecutive_errors=1000)


def make_example_batch(opts, batch_size: int,
                       dtype=np.float32) -> Dict[str, Dict[str, np.ndarray]]:
    """A zero-filled batch with the canonical schema/shapes, for shape
    inference, initialization, and dry runs. Poses/intrinsics are identity
    so the geometry stays finite."""
    b = batch_size
    k = opts.model_num_views - 1
    h, w = opts.image_height, opts.image_width
    dh, dw = h // 2, w // 2
    eye = np.broadcast_to(np.eye(4, dtype=dtype), (b, 4, 4)).copy()
    eye_k = np.broadcast_to(np.eye(4, dtype=dtype), (b, k, 4, 4)).copy()

    def K_at(scale_h, scale_w, shape):
        K = np.eye(4, dtype=dtype)
        K[0, 0] = K[0, 2] = scale_w / 2.0
        K[1, 1] = K[1, 2] = scale_h / 2.0
        return np.broadcast_to(K, shape + (4, 4)).copy()

    m = opts.matching_scale
    mh, mw = h // (2 ** (m + 1)), w // (2 ** (m + 1))
    invK_s0 = np.broadcast_to(np.linalg.inv(K_at(dh, dw, ())[..., :, :]),
                              (b, 4, 4)).astype(dtype).copy()
    invK_m = np.broadcast_to(np.linalg.inv(K_at(mh, mw, ())[..., :, :]),
                             (b, 4, 4)).astype(dtype).copy()
    cur = {
        "image_b3hw": np.zeros((b, 3, h, w), dtype),
        "depth_bhw": np.ones((b, dh, dw), dtype),
        "mask_b_bhw": np.ones((b, dh, dw), bool),
        "invK_s0_b44": invK_s0,
        f"invK_s{m}_b44": invK_m,
        "world_T_cam_b44": eye.copy(),
        "cam_T_world_b44": eye.copy(),
    }
    src = {
        "image_b3hw": np.zeros((b, k, 3, h, w), dtype),
        "depth_bkhw": np.ones((b, k, dh, dw), dtype),
        "K_s0_bk44": K_at(dh, dw, (b, k)),
        f"K_s{m}_b44": K_at(mh, mw, (b, k)),
        "world_T_cam_b44": eye_k.copy(),
        "cam_T_world_b44": eye_k.copy(),
    }
    return {"cur": cur, "src": src}


def init_train_state(model, optimizer, rng,
                     example_batch) -> TrainState:
    """Initializes params/batch_stats/optimizer state from a host batch.

    The init is jitted: eager init dispatches each op separately, which
    is pathological over a remote-TPU (axon) tunnel."""
    batch = jax.tree_util.tree_map(jnp.asarray, example_batch)
    init = jax.jit(lambda r, cur, src: model.init(r, cur, src, flip=False,
                                                  train=False))
    variables = init(rng, batch["cur"], batch["src"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=optimizer.init(params))


def _forward_and_losses(model, params, batch_stats, batch, flip, train):
    cur, src = batch["cur"], batch["src"]
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        outputs, mutated = model.apply(
            variables, cur, src, flip=flip, train=True,
            mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        outputs = model.apply(variables, cur, src, flip=flip, train=False)
        new_stats = batch_stats

    depth_pred_s0 = outputs["depth_pred_s0_bhw1"][..., 0].astype(jnp.float32)
    invK_s0 = cur["invK_s0_b44"].astype(jnp.float32)
    # normals from GT (NaNs propagate -> masked in the loss) and prediction,
    # mirroring the reference's NormalGenerator usage
    # (`depth_model.py:526-531`).
    outputs["normals_pred_bhw3"] = geo.normals_from_depth(
        depth_pred_s0, invK_s0)
    gt_normals = geo.normals_from_depth(
        jnp.where(cur["mask_b_bhw"], cur["depth_bhw"], jnp.nan).astype(
            jnp.float32), invK_s0)

    loss_cur = dict(cur)
    loss_cur["normals_bhw3"] = gt_normals
    # the data pipeline keeps the reference's key names (K_s0_b44 even
    # for the stacked (b, k, 4, 4) source tensor); map to the loss names
    loss_src = {
        "depth_bkhw": src["depth_bkhw"],
        "K_s0_bk44": src.get("K_s0_bk44", src.get("K_s0_b44")),
        "cam_T_world_bk44": src["cam_T_world_b44"],
    }
    loss_dict = loss_lib.compute_losses(loss_cur, loss_src, outputs)
    return loss_dict, outputs, new_stats


def train_step_fn(model, optimizer) -> Callable:
    """Returns `step(state, batch, rng) -> (state, metrics)` (un-jitted)."""

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        flip = jax.random.bernoulli(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            loss_dict, _, new_stats = _forward_and_losses(
                model, params, state.batch_stats, batch, flip, train=True)
            return loss_dict["loss"], (loss_dict, new_stats)

        grads, (loss_dict, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    return step


def eval_step_fn(model) -> Callable:
    """Returns `eval(state, batch) -> (loss_metrics, outputs)` (un-jitted);
    the reference's `validation_step` (`depth_model.py:611-613`)."""

    def step(state: TrainState, batch):
        loss_dict, outputs, _ = _forward_and_losses(
            model, state.params, state.batch_stats, batch,
            flip=jnp.asarray(False), train=False)
        return loss_dict, outputs

    return step


def make_sharded_forward(model, variables, mesh) -> Callable:
    """Batch-sharded inference: replicated params, batch split over the
    `data` axis — production serving over all chips in one jitted call.

    When the model's cost volume runs the Pallas kernel, the forward is
    wrapped in `shard_map` instead of relying on GSPMD propagation:
    `pallas_call` carries no partitioning rule, so under a plain
    >1-device jit the compiler would all-gather the batch and replicate
    the kernel. Inside `shard_map` each device runs the kernel on its
    local batch shard — the single-chip kernel win scales linearly."""
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def forward(variables, cur_data, src_data):
        return model.apply(variables, cur_data, src_data, flip=False,
                           train=False, return_mask=True)

    uses_pallas = str(getattr(model, "cost_volume_backend",
                              "")).startswith("pallas")
    if mesh.devices.size > 1 and uses_pallas:
        from jax.sharding import PartitionSpec as P
        if jax.default_backend() != "tpu":
            # Mirror the train path's fallback: interpret-mode Pallas at
            # full grid sizes per shard is a compile hazard on 1-core
            # virtual-mesh hosts — keep the shard_map program structure
            # but compute with the XLA fused backend per shard.
            model = model.clone(cost_volume_backend="xla_fused")
            logger.info("sharded forward: shard_map, pallas->xla_fused "
                        "fallback (non-TPU backend)")
        else:
            logger.info("sharded forward: shard_map with per-device "
                        "Pallas kernels")

        def forward(variables, cur_data, src_data, _model=model):
            return _model.apply(variables, cur_data, src_data, flip=False,
                                train=False, return_mask=True)

        axis = mesh.axis_names[-1]
        forward = shard_map_nocheck(forward, mesh=mesh,
                                    in_specs=(P(), P(axis), P(axis)),
                                    out_specs=P(axis))
    else:
        logger.info("sharded forward: GSPMD propagation")

    fn = jax.jit(forward, in_shardings=(rep, data, data),
                 out_shardings=data)
    return lambda cur, src: fn(variables, cur, src)


def make_sharded_train_step(model, optimizer, mesh,
                            donate: bool = True,
                            parity_metrics: bool = False) -> Callable:
    """Jits the train step over the mesh: replicated state, batch-sharded
    data — the DDP-equivalent collective rides ICI.

    Two compilation strategies, picked automatically:

      * GSPMD (default): one jitted program; XLA's sharding propagation
        inserts the gradient `psum`. Exact global-batch semantics
        (masked loss means are over the FULL batch).
      * `shard_map` (when the cost volume uses the Pallas custom VJP on
        a >1-device mesh): `pallas_call` carries no GSPMD partitioning
        rule, so plain jit would all-gather the sharded batch and
        replicate the kernel. `shard_map` runs the kernel per device on
        the local shard and `pmean`s gradients/metrics/batch-stats
        explicitly — the reference's DDP semantics exactly (torch DDP
        averages per-device losses and never synchronizes BatchNorm,
        `/root/reference/train.py:124-145`; our pmean of running stats
        is strictly tighter than DDP's unsynced per-device stats).

    With `parity_metrics=True` the step additionally reports an
    SPMD-semantics self-check in its metrics: an eval-mode (fixed
    batch-stats, no flip) loss computed the distributed way
    (`parity_loss_sharded`) and the same loss computed on the full
    gathered/replicated batch exactly as one device would
    (`parity_loss_global`). A missing collective or wrong mean shows up
    as an O(1) gap between the two. Costs two extra forwards — meant
    for dry runs and debugging, not production steps.
    """
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)  # pytree-prefix: applies to every batch leaf
    if (mesh.devices.size > 1
            and str(getattr(model, "cost_volume_custom_vjp", False)
                     ).startswith("pallas")):
        logger.info(
            "train step strategy: shard_map DDP (per-device kernels; "
            "loss = mean of per-shard masked means, torch-DDP semantics)")
        return _make_shardmap_train_step(model, optimizer, mesh, donate,
                                         parity_metrics=parity_metrics)
    logger.info("train step strategy: GSPMD (single program; loss = "
                "global-batch masked means)")
    step = train_step_fn(model, optimizer)
    if parity_metrics and mesh.devices.size > 1:
        base_step = step

        def step(state, batch, rng):
            new_state, metrics = base_step(state, batch, rng)
            # same math under two partitionings: propagated (XLA inserts
            # the collectives) vs explicitly replicated (every device
            # computes the full batch, i.e. the single-device program)
            rep_batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), batch)
            e_sharded, _, _ = _forward_and_losses(
                model, state.params, state.batch_stats, batch,
                jnp.asarray(False), train=False)
            e_global, _, _ = _forward_and_losses(
                model, state.params, state.batch_stats, rep_batch,
                jnp.asarray(False), train=False)
            metrics["parity_loss_sharded"] = e_sharded["loss"]
            metrics["parity_loss_global"] = e_global["loss"]
            return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else ())


def _make_shardmap_train_step(model, optimizer, mesh,
                              donate: bool = True,
                              force_kernels: bool = False,
                              parity_metrics: bool = False) -> Callable:
    """DDP train step as an explicit-collective `shard_map` program.

    Per-device: forward + backward on the local batch shard (the Pallas
    fused-sweep kernels run per device — no GSPMD rule needed), then
    `pmean` over the `data` axis for gradients, loss metrics, and
    BatchNorm running stats. Params/optimizer state stay replicated, so
    the update is computed identically on every device (no broadcast).

    Semantics note: per-shard masked loss means are averaged across
    devices (mean-of-means), which equals the global masked mean when
    shards carry equal valid-pixel counts and matches torch DDP's
    loss averaging otherwise (divergence quantified by
    tests/test_train_parallel.py::test_shardmap_loss_semantics_unequal_masks).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[-1]
    if jax.default_backend() != "tpu" and not force_kernels:
        # Virtual CPU meshes (tests, driver dryrun) validate the
        # shard_map + pmean structure; interpret-mode Pallas at full
        # grid sizes is a compile-time hazard on 1-core hosts, so the
        # per-device compute falls back to checkpointed autodiff there.
        # Real TPU meshes keep the kernels. The combination (shard_map
        # + interpret kernels) is covered at tiny shapes by
        # tests/test_train_parallel.py::test_shardmap_pallas_kernel.
        model = model.clone(cost_volume_custom_vjp=False)

    def local_step(state: TrainState, batch, rng):
        flip = jax.random.bernoulli(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            loss_dict, _, new_stats = _forward_and_losses(
                model, params, state.batch_stats, batch, flip, train=True)
            return loss_dict["loss"], (loss_dict, new_stats)

        grads, (loss_dict, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        # per-leaf pmean: measured BETTER than raveling everything into
        # one flat collective — the 49M-param concat + per-leaf slices
        # doubled both compile and step time on the virtual CPU mesh,
        # and on real ICI the ~780 launch overheads are ~ms against a
        # 630 ms step
        grads = jax.lax.pmean(grads, axis)
        loss_dict = jax.lax.pmean(loss_dict, axis)
        new_stats = jax.lax.pmean(new_stats, axis)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in loss_dict.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        if parity_metrics:
            # SPMD-semantics self-check, eval mode (running batch-stats,
            # no flip) so the forward is per-element along the batch and
            # mean-of-shard-means must equal the joint-batch loss. The
            # reference side runs on a 2-shard PAIR, not the full
            # gathered batch: every device would otherwise pay an
            # n_devices-times-bigger forward, and two shards already
            # expose a missing collective / wrong mean as an O(1) gap.
            e_local, _, _ = _forward_and_losses(
                model, state.params, state.batch_stats, batch,
                jnp.asarray(False), train=False)
            pair = min(2, int(mesh.shape[axis]))
            local_b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            pair_batch = jax.tree_util.tree_map(
                lambda x: jax.lax.all_gather(
                    x, axis, axis=0, tiled=True)[:pair * local_b],
                batch)
            e_pair, _, _ = _forward_and_losses(
                model, state.params, state.batch_stats, pair_batch,
                jnp.asarray(False), train=False)
            idx = jax.lax.axis_index(axis)
            sel = (idx < pair).astype(jnp.float32)
            metrics["parity_loss_sharded"] = jax.lax.psum(
                sel * e_local["loss"], axis) / pair
            metrics["parity_loss_global"] = e_pair["loss"]
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        return new_state, metrics

    smapped = shard_map_nocheck(local_step, mesh=mesh,
                                in_specs=(P(), P(axis), P()),
                                out_specs=(P(), P()))
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        smapped,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else ())
