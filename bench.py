"""Headline benchmark: hero-model depth inference latency at 512x384.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Baseline: the reference's speed-optimized hero latency, 70 ms per 512x384
depth map, batch 1, on an A100-class GPU with `--fast_cost_volume`
(`/root/reference/README.md:86-92`; BASELINE.md). `vs_baseline` is the
speedup factor baseline_ms / our_ms (>1 means faster than the reference).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MS = 70.0  # hero model, fast cost volume, A100, batch 1


def main():
    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import make_example_batch

    opts = Options()  # hero defaults: 512x384, 64 planes, 8 views
    opts.precision = "16"  # bf16 compute
    model = build_depth_model(opts)

    batch = make_example_batch(opts, batch_size=1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch["cur"], batch["src"], flip=False,
                           train=False)

    @jax.jit
    def forward(variables, cur, src):
        out = model.apply(variables, cur, src, flip=False, train=False)
        return out["depth_pred_s0_bhw1"]

    # compile + warmup
    forward(variables, batch["cur"], batch["src"]).block_until_ready()
    for _ in range(3):
        forward(variables, batch["cur"], batch["src"]).block_until_ready()

    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, batch["cur"], batch["src"])
    out.block_until_ready()
    ms = (time.perf_counter() - start) / iters * 1e3

    print(json.dumps({
        "metric": "hero_depth_latency_512x384_b1",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
