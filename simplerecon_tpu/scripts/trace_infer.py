"""Device-side profiler-trace attribution of the b1 inference forward.

Same method as trace_train.py but for the serving path: the jitted
hero-model forward (backend "pallas") at batch 1. Prints the trace path;
aggregate with trace_agg.py.

    python -m simplerecon_tpu.scripts.trace_infer [batch] [steps]
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np

    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import make_example_batch

    opts = Options()
    opts.precision = "16"
    opts.cost_volume_backend = os.environ.get("BENCH_BACKEND", "pallas")
    model = build_depth_model(opts)
    host = make_example_batch(opts, batch_size=batch)
    rng_np = np.random.RandomState(0)
    host["cur"]["image_b3hw"] = rng_np.randn(
        *host["cur"]["image_b3hw"].shape).astype("float32")
    host["src"]["image_b3hw"] = rng_np.randn(
        *host["src"]["image_b3hw"].shape).astype("float32")
    data = jax.tree_util.tree_map(jnp.asarray, host)
    init = jax.jit(lambda rng, cur, src: model.init(
        rng, cur, src, flip=False, train=False))
    variables = init(jax.random.PRNGKey(0), data["cur"], data["src"])

    @jax.jit
    def fwd(v, d):
        return model.apply(v, d["cur"], d["src"], flip=False,
                           train=False)

    out = fwd(variables, data)
    jax.block_until_ready(out)
    print("compiled; tracing", flush=True)

    trace_dir = "/tmp/jtrace_infer"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(nsteps):
        out = fwd(variables, data)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print("trace:", sorted(files)[-1], flush=True)


if __name__ == "__main__":
    main()
