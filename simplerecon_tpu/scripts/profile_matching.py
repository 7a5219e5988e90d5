"""Sub-stage on-device timing of the ResNet matching encoder.

Times cumulative prefixes of the production forward (via the module's
`stage_out` tap, so the measured program IS the shipped code path):
conv1+BN+ReLU -> antialiased pool -> layer1 (2 BasicBlocks) -> head.
Differences give the per-stage cost. Same two-point chained-iteration
harness as profile_stages (relay-cache-proof).

    python -m simplerecon_tpu.scripts.profile_matching [batch=8]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import os

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from simplerecon_tpu.scripts.profile_stages import _two_point


def main(batch: int = 8, h: int = 384, w: int = 512):
    from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder

    model = ResnetMatchingEncoder(num_ch_out=16, dtype=jnp.bfloat16)
    images = jnp.asarray(np.random.RandomState(0).randn(batch, h, w, 3),
                         jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, False))(
        jax.random.PRNGKey(0), images)

    def chain_over(stage):
        def make(kk):
            def chain(variables, x):
                def body(i, token):
                    xi = jnp.maximum(x, (token + i.astype(jnp.float32) * 1e-3
                                         ).astype(x.dtype) - 1e5)
                    out = model.apply(variables, xi, False, stage)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return chain
        return make, (variables, images)

    results = {}
    for stage in ("conv1", "pool", "layer1", None):
        make, args = chain_over(stage)
        results[stage or "head(full)"] = _two_point(make, args)

    print(f"matching encoder, batch={batch} ({w}x{h} bf16)")
    prev = 0.0
    for name, cum in results.items():
        print(f"  through {name:12s} {cum:8.3f} ms  (+{cum - prev:6.3f})")
        prev = cum


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
