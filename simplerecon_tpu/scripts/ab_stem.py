"""Same-process interleaved A/B of matching-encoder stem variants.

Run-to-run relay drift (~0.5 ms session to session) swamps sub-ms wins,
so every variant is timed in ROUND-ROBIN within one process: estimate e
times variant v before any variant sees estimate e+1.
"""
import os  # noqa: F401
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder

B, H, W = 8, 384, 512
K1, K2, EST = 4, 36, 5

rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(B, H, W, 3), jnp.bfloat16)

VARIANTS = {
    "direct+refpool": dict(stem_impl="direct", pool_impl="reference"),
    "direct+fused":   dict(stem_impl="direct", pool_impl="fused"),
    "s2d/tr+fused":   dict(stem_impl="s2d", stem_pack="transpose",
                           pool_impl="fused"),
    "s2d/sl+fused":   dict(stem_impl="s2d", stem_pack="slices",
                           pool_impl="fused"),
    "s2d/sl+refpool": dict(stem_impl="s2d", stem_pack="slices",
                           pool_impl="reference"),
}

chains = {}
for name, kw in VARIANTS.items():
    model = ResnetMatchingEncoder(num_ch_out=16, dtype=jnp.bfloat16, **kw)
    variables = jax.jit(lambda r, x, m=model: m.init(r, x, False))(
        jax.random.PRNGKey(0), images)

    def make(kk, m=model, v=variables):
        def chain(x):
            def body(i, token):
                xi = jnp.maximum(
                    x, (token - jnp.float32(30.0)
                        + i.astype(jnp.float32) * jnp.float32(1e-6)
                        ).astype(x.dtype))
                out = m.apply(v, xi, False)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return chain

    c1, c2 = jax.jit(make(K1)), jax.jit(make(K2))
    float(c1(images)); float(c2(images))
    chains[name] = (c1, c2)
    print(f"compiled {name}", flush=True)

results = {n: [] for n in chains}
for e in range(EST):
    for name, (c1, c2) in chains.items():
        ts = []
        for c in (c1, c2):
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(c(images))
                reps.append(time.perf_counter() - t0)
            ts.append(sorted(reps)[1])
        results[name].append((ts[1] - ts[0]) / (K2 - K1) * 1e3)
    print(f"estimate {e} done", flush=True)

for name, es in results.items():
    es = sorted(es)
    print(f"  {name:16s} median {es[len(es)//2]:7.3f} ms  "
          f"[{es[0]:.3f}, {es[-1]:.3f}]", flush=True)
