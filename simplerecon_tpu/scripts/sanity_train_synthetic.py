"""End-to-end learnability check on rasterizer-rendered geometry.

Trains the full hero model from scratch on the in-memory synthetic
"room" dataset (`data/synthetic.py`) — geometrically-consistent RGB,
depth, poses, intrinsics — and reports depth abs_rel before and after.
Because the data is real multi-view geometry (not noise), the cost
volume + decoder must actually learn matching for the error to drop;
this validates the whole training stack end-to-end without any external
dataset.

    python -m simplerecon_tpu.scripts.sanity_train_synthetic \
        [--steps 300] [--batch 4]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.loader import DataLoader, to_train_schema
from simplerecon_tpu.data.synthetic import SyntheticDataset
from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options
from simplerecon_tpu.parallel.train import (eval_step_fn, init_train_state,
                                            make_optimizer, train_step_fn)
from simplerecon_tpu.utils.metrics import compute_depth_metrics_batched


def make_opts(args) -> Options:
    opts = Options()
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins = 32
    opts.model_num_views = 4
    opts.num_images_in_tuple = 4
    opts.min_matching_depth = 0.25
    opts.max_matching_depth = 8.0
    opts.batch_size = args.batch
    opts.lr = 3e-4
    opts.matching_norm = args.matching_norm
    # custom-VJP arm for the norm/gradient ablation: the shipped default
    # is "pallas_bwd"; "autodiff" reproduces the round-2 learnability
    # PASS configuration (checkpointed autodiff through the XLA sweep)
    opts.cost_volume_custom_vjp = {
        "autodiff": False, "xla": True}.get(args.cvjp, args.cvjp)
    return opts


def _abs_rel_of(pred_bhw1, batch) -> list:
    pred = np.asarray(pred_bhw1[..., 0])
    gt = np.asarray(batch["cur"]["depth_bhw"])
    valid = np.asarray(batch["cur"]["mask_b_bhw"]) & (gt > 0)
    m = compute_depth_metrics_batched(jnp.asarray(gt), jnp.asarray(pred),
                                      jnp.asarray(valid))
    return [v for v in np.asarray(m["abs_rel"]) if np.isfinite(v)]


def eval_abs_rel(eval_step, state, batches) -> float:
    vals = []
    for batch in batches:
        _, outputs = eval_step(state, batch)
        vals.extend(_abs_rel_of(outputs["depth_pred_s0_bhw1"], batch))
    return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)  # BN running stats need ~500 steps to settle
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--eval_every", type=int, default=300)
    # BN re-estimation experiment (the eval-metrics-lag probe): after
    # every eval, ALSO report abs_rel with running stats re-estimated
    # from N train-mode forward passes — isolating how much of the
    # train/eval metric gap is pure BatchNorm running-stat staleness
    ap.add_argument("--bn_recal", type=int, default=0)
    # "group" swaps the matching stem's BatchNorms for GroupNorm-8
    # (train == eval) — the norm-choice ablation paired with --bn_recal
    ap.add_argument("--matching_norm", default="batch",
                    choices=["batch", "group"])
    ap.add_argument("--cvjp", default="pallas_bwd",
                    choices=["pallas_bwd", "pallas", "xla", "autodiff"])
    args = ap.parse_args()
    print(f"config: steps={args.steps} batch={args.batch} "
          f"norm={args.matching_norm} cvjp={args.cvjp} "
          f"bn_recal={args.bn_recal}", flush=True)

    opts = make_opts(args)
    dataset = SyntheticDataset(num_frames=48,
                               image_height=opts.image_height,
                               image_width=opts.image_width,
                               num_images_in_tuple=4)
    loader = DataLoader(dataset, batch_size=opts.batch_size, shuffle=True,
                        num_workers=2, drop_last=True,
                        adapter=to_train_schema, seed=0)

    model = build_depth_model(opts)
    optimizer = make_optimizer(opts)

    batches = []
    it = iter(loader)
    for _ in range(3):  # small fixed eval set
        batches.append(jax.tree_util.tree_map(jnp.asarray, next(it)))

    state = init_train_state(model, optimizer, jax.random.PRNGKey(0),
                             jax.tree_util.tree_map(np.asarray,
                                                    batches[0]))
    step_fn = jax.jit(train_step_fn(model, optimizer),
                      donate_argnums=(0,))
    eval_step = jax.jit(eval_step_fn(model))

    @jax.jit
    def train_mode_pred(state, batch):
        """Batch-stat (train-mode) forward, stats update DISCARDED — the
        discriminator between 'BN running stats are stale' (train-mode
        abs_rel small, eval-mode huge) and 'the model never learned
        depth at all' (both huge)."""
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["cur"], batch["src"], flip=False, train=True,
            mutable=["batch_stats"])
        return out["depth_pred_s0_bhw1"]

    def train_mode_abs_rel(state) -> float:
        vals = []
        for b in batches:
            vals.extend(_abs_rel_of(train_mode_pred(state, b), b))
        return float(np.mean(vals))

    @jax.jit
    def stats_summary(state):
        """Drift indicators for the BN running stats."""
        leaves = jax.tree_util.tree_leaves_with_path(state.batch_stats)
        means = [l for p, l in leaves if "mean" in jax.tree_util.keystr(p)]
        vars_ = [l for p, l in leaves if "var" in jax.tree_util.keystr(p)]
        max_mean = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(m)) for m in means]))
        max_var = jnp.max(jnp.asarray([jnp.max(v) for v in vars_]))
        return max_mean, max_var

    @jax.jit
    def recal_step(state, batch):
        """One train-mode forward purely for the BN running-stat EMA
        (momentum 0.9 => ~10 passes to converge to the data stats)."""
        _, mut = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["cur"], batch["src"], flip=False, train=True,
            mutable=["batch_stats"])
        return state.replace(batch_stats=mut["batch_stats"])

    def recal_abs_rel(state) -> float:
        for _ in range(max(1, args.bn_recal // len(batches))):
            for b in batches:
                state = recal_step(state, b)
        return eval_abs_rel(eval_step, state, batches)

    abs_rel_0 = eval_abs_rel(eval_step, state, batches)
    print(f"step 0: abs_rel={abs_rel_0:.4f}")

    rng = jax.random.PRNGKey(1)
    step = 0
    t0 = time.perf_counter()
    while step < args.steps:
        for batch in loader:
            if step >= args.steps:
                break
            device_batch = jax.tree_util.tree_map(jnp.asarray, batch)
            state, metrics = step_fn(state, device_batch, rng)
            step += 1
            if step % args.eval_every == 0:
                abs_rel = eval_abs_rel(eval_step, state, batches)
                abs_rel_tm = train_mode_abs_rel(state)
                mm, mv = stats_summary(state)
                recal = (f" abs_rel_bn_recal={recal_abs_rel(state):.4f}"
                         if args.bn_recal else "")
                print(f"step {step}: loss={float(metrics['loss']):.4f} "
                      f"abs_rel={abs_rel:.4f} "
                      f"abs_rel_trainmode={abs_rel_tm:.4f}{recal} "
                      f"bn_max|mean|={float(mm):.1f} "
                      f"bn_max_var={float(mv):.1f} "
                      f"({step / (time.perf_counter() - t0):.1f} it/s)",
                      flush=True)

    abs_rel_final = eval_abs_rel(eval_step, state, batches)
    improved = abs_rel_final < 0.6 * abs_rel_0
    print(f"final abs_rel: {abs_rel_0:.4f} -> {abs_rel_final:.4f} "
          f"({'PASS' if improved else 'FAIL: expected >40% improvement'})")
    return abs_rel_0, abs_rel_final


if __name__ == "__main__":
    main()
