"""Device-side profiler-trace attribution of the full train step.

Captures a jax.profiler trace of `train_step_fn` (the exact program
bench.py times: fwd + bwd + AdamW at the hero topology) and aggregates
per-op device durations from the trace JSON by (a) hlo_category and
(b) the JAX scope path in op metadata — the first exact attribution of
the b16 step (the two-point stage split under-counts: it differentiates
w.r.t. stage inputs, so weight-grad contractions are unattributed).

    python -m simplerecon_tpu.scripts.trace_train [batch] [steps]

Prints top scopes/categories and writes /tmp/trace_train_agg.json.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_step(batch: int):
    import numpy as np

    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import (init_train_state,
                                                make_example_batch,
                                                make_optimizer,
                                                train_step_fn)

    opts = Options()
    opts.precision = "16"
    opts.cost_volume_backend = os.environ.get("BENCH_BACKEND", "xla_fused")
    model = build_depth_model(opts)
    optimizer = make_optimizer(opts)
    host = make_example_batch(opts, batch_size=batch)
    rng_np = np.random.RandomState(0)
    host["cur"]["depth_bhw"] = (
        1 + rng_np.rand(*host["cur"]["depth_bhw"].shape)).astype("float32")
    host["src"]["depth_bkhw"] = (
        1 + rng_np.rand(*host["src"]["depth_bkhw"].shape)).astype("float32")
    data = jax.tree_util.tree_map(jnp.asarray, host)
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0), host)
    step = jax.jit(train_step_fn(model, optimizer), donate_argnums=(0,))
    return step, state, data


_SCOPE_RE = re.compile(r'op_name="([^"]*)"')


def scope_of(long_name: str) -> str:
    m = _SCOPE_RE.search(long_name)
    if not m:
        return "(no metadata)"
    # op_name like: jit(step)/jvp(...)/DepthModel/cv_encoder/ds_conv_0/...
    parts = m.group(1).split("/")
    keep = [p for p in parts
            if not p.startswith(("jit(", "jvp(", "transpose("))]
    # bucket by the first two model-ish components
    return "/".join(keep[:3]) if keep else m.group(1)[:60]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    step, state, data = build_step(batch)
    rng = jax.random.PRNGKey(1)
    # compile + one warm step outside the trace
    state, m = step(state, data, jax.random.fold_in(rng, 0))
    jax.block_until_ready(m)
    print("compiled; tracing", flush=True)

    trace_dir = "/tmp/jtrace_train"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(1, 1 + nsteps):
        state, m = step(state, data, jax.random.fold_in(rng, i))
    jax.block_until_ready(m)
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(sorted(files)[-1]) as f:
        t = json.load(f)

    by_scope = collections.defaultdict(float)
    by_cat = collections.defaultdict(float)
    examples = {}
    total = 0.0
    for e in t.get("traceEvents", []):
        if e.get("ph") != "X" or e.get("tid") != 3:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur_ms = e["dur"] / 1e3  # trace is in us
        ln = args.get("long_name", "")
        sc = scope_of(ln)
        by_scope[sc] += dur_ms
        by_cat[cat] += dur_ms
        total += dur_ms
        if sc not in examples:
            examples[sc] = ln[:160]

    per_step = total / nsteps
    print(f"\ndevice total {total:.2f} ms over {nsteps} steps "
          f"= {per_step:.2f} ms/step\n")
    print("by hlo_category (ms/step):")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:32s} {v / nsteps:9.3f}")
    print("\nby scope (ms/step, top 40):")
    for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k:64s} {v / nsteps:9.3f}")

    with open("/tmp/trace_train_agg.json", "w") as f:
        json.dump({"per_step_ms": per_step,
                   "by_category": {k: v / nsteps for k, v in by_cat.items()},
                   "by_scope": {k: v / nsteps for k, v in by_scope.items()},
                   "examples": examples}, f, indent=1)
    print("\nwrote /tmp/trace_train_agg.json", flush=True)


if __name__ == "__main__":
    main()
