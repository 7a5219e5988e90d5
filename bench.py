"""Headline benchmark: hero-model depth inference latency at 512x384.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline: the reference's speed-optimized hero latency, 70 ms per 512x384
depth map, batch 1, on an A100-class GPU with `--fast_cost_volume`
(`/root/reference/README.md:86-92`; BASELINE.md). `vs_baseline` is the
speedup factor baseline_ms / our_ms (>1 means faster than the reference).

Env knobs (defaults chosen for the driver run):
    BENCH_BACKEND   xla | pallas   (cost-volume path; default pallas)
    BENCH_BATCH     batch size     (default 1; latency still /frame)
    BENCH_ITERS     timed iterations (default 20)
    BENCH_MODE      infer | train  (train = full jitted train step,
                    XLA backend, batch default 16; reports ms/step)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_MS = 70.0  # hero model, fast cost volume, A100, batch 1


def build(backend: str, batch: int):
    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import make_example_batch

    opts = Options()  # hero defaults: 512x384, 64 planes, 8 views
    opts.precision = "16"  # bf16 compute
    opts.fast_cost_volume = backend == "pallas"
    if os.environ.get("BENCH_MODEL") == "dot_product":
        opts.feature_volume_type = "simple_cost_volume"
    model = build_depth_model(opts)

    data = make_example_batch(opts, batch_size=batch)
    data = jax.tree_util.tree_map(jnp.asarray, data)

    # jit the init: eager init dispatches thousands of ops individually,
    # which is pathological over a remote-TPU tunnel
    init = jax.jit(lambda rng, cur, src: model.init(rng, cur, src,
                                                    flip=False,
                                                    train=False))
    variables = init(jax.random.PRNGKey(0), data["cur"], data["src"])

    @jax.jit
    def forward(variables, cur, src):
        out = model.apply(variables, cur, src, flip=False, train=False)
        return out["depth_pred_s0_bhw1"]

    return forward, variables, data


def time_forward(forward, variables, data, iters: int) -> float:
    forward(variables, data["cur"], data["src"]).block_until_ready()
    for _ in range(3):
        forward(variables, data["cur"], data["src"]).block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, data["cur"], data["src"])
    out.block_until_ready()
    return (time.perf_counter() - start) / iters * 1e3


def bench_train(batch: int, iters: int):
    """Full jitted train step (fwd + bwd + AdamW) on one chip.

    Baseline: the reference trains 110k steps at global batch 16 in
    ~36 h on 2x A100 (README.md:86-92) = ~1.18 s per batch-16 step per
    GPU-pair; vs_baseline is that 1180 ms over our ms/step."""
    import numpy as np

    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import (init_train_state,
                                                make_example_batch,
                                                make_optimizer,
                                                train_step_fn)

    opts = Options()
    opts.precision = "16"
    model = build_depth_model(opts)
    optimizer = make_optimizer(opts)

    host = make_example_batch(opts, batch_size=batch)
    rng_np = np.random.RandomState(0)
    host["cur"]["depth_bhw"] = (
        1 + rng_np.rand(*host["cur"]["depth_bhw"].shape)).astype("float32")
    host["src"]["depth_bkhw"] = (
        1 + rng_np.rand(*host["src"]["depth_bkhw"].shape)).astype("float32")
    data = jax.tree_util.tree_map(jnp.asarray, host)

    state = init_train_state(model, optimizer, jax.random.PRNGKey(0),
                             host)
    step = jax.jit(train_step_fn(model, optimizer), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    state, m = step(state, data, rng)
    jax.block_until_ready(m["loss"])
    start = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data, rng)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - start) / iters * 1e3


def main():
    # measured on one TPU chip (2026-08-16): pallas 0.664 ms, xla 0.741 ms
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    mode = os.environ.get("BENCH_MODE", "infer")
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    if mode == "train":
        batch = int(os.environ.get("BENCH_BATCH", "16"))
        ms = bench_train(batch, iters)
        print(json.dumps({
            "metric": f"hero_train_step_512x384_b{batch}",
            "value": round(ms, 3),
            "unit": "ms",
            "vs_baseline": round(1180.0 / ms, 3),
        }))
        return

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    forward, variables, data = build(backend, batch)
    ms_total = time_forward(forward, variables, data, iters)
    ms = ms_total / batch  # per frame

    model_name = ("dot_product"
                  if os.environ.get("BENCH_MODEL") == "dot_product"
                  else "hero")
    print(json.dumps({
        "metric": f"{model_name}_depth_latency_512x384_b{batch}_{backend}",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
