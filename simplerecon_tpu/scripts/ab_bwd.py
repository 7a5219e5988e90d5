"""Same-process interleaved A/B of the pallas fwd+bwd sweep kernels'
tile configs at the TRAINING batch (fwd kernel + hand-written backward
kernel, the `cost_volume_custom_vjp="pallas_bwd"` path — 201 ms of the
544 ms b16 train step per profile_train_stages).

    python -m simplerecon_tpu.scripts.ab_bwd [batch=16]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from simplerecon_tpu.ops import cost_volume as cv_ops
from simplerecon_tpu.ops import pallas_cv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K1, K2, EST = 2, 8, 5

CONFIGS = [
    (4, 128, (16, 32)),   # shipped default
    (8, 128, (16, 32)),
    (4, 128, (16,)),
    (2, 128, (16, 32)),
]

b, k, h, w, c, d = B, 7, 96, 128, 16, 64
rng = np.random.RandomState(0)
src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.bfloat16)
cur = jnp.asarray(rng.randn(b, h * w, c), jnp.bfloat16)


def rot(t):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[2, 2] = np.cos(t)
    m[0, 2] = np.sin(t)
    m[2, 0] = -np.sin(t)
    return m


ex = np.stack([rot(0.04 * i) for i in range(k)])[None]
ex = np.broadcast_to(ex, (b, k, 4, 4)).copy()
ex[..., 0, 3] = np.linspace(-0.15, 0.15, k)
Km = np.eye(4, dtype=np.float32)
Km[0, 0] = Km[1, 1] = 120.0
Km[0, 2], Km[1, 2] = w / 2, h / 2
src_K = jnp.asarray(np.broadcast_to(Km, (b, k, 4, 4)).copy())
invK = jnp.asarray(np.broadcast_to(np.linalg.inv(Km), (b, 4, 4)).copy())
ex = jnp.asarray(ex)
planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)
penalty = jnp.asarray(rng.rand(b, k, 3).astype(np.float32))
loc = ex[:, :, :3, 3]
cin = c * (1 + k) + (1 + k) + 3 * (1 + k) + 3 * k + k + k + k
w0 = jnp.asarray(rng.randn(cin, 128) * 0.05, jnp.bfloat16)
b0 = jnp.zeros((128,), jnp.float32)
w1 = jnp.asarray(rng.randn(128, 128) * 0.05, jnp.bfloat16)
b1v = jnp.zeros((128,), jnp.float32)
w2 = jnp.asarray(rng.randn(128, 1) * 0.05, jnp.bfloat16)
b2 = jnp.zeros((1,), jnp.float32)

chains = {}
for th, tw, bands in CONFIGS:
    name = f"t({th},{tw})b{bands}"

    def make(kk, th=th, tw=tw, bands=bands):
        def fwd_bwd(s):
            def loss(s_):
                vol = pallas_cv.banded_warp_feature_volume(
                    s_, cur, ex, src_K, invK, planes, penalty, loc,
                    w0, b0, w1, b1v, w2, b2,
                    tile_h=th, tile_w=tw, bands=bands)
                return jnp.sum(vol.astype(jnp.float32))

            # fwd kernel + the hand-written bwd kernel, value feeds the
            # chain so neither pass can be dead-code-eliminated
            val = loss(s)
            grads = pallas_cv.banded_warp_feature_volume_bwd(
                s, cur, ex, src_K, invK, planes, penalty, loc,
                w0, b0, w1, b1v, w2, b2,
                jnp.ones((b, d, h * w), jnp.float32),
                tile_h=th, tile_w=tw, bands=bands)
            return val + sum(jnp.sum(g.astype(jnp.float32))
                             for g in grads)

        def chain(s):
            def body(i, token):
                si = jnp.maximum(
                    s, (token * 1e-9 - jnp.float32(30.0)
                        + i.astype(jnp.float32) * jnp.float32(1e-6)
                        ).astype(s.dtype))
                return fwd_bwd(si)
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return chain

    try:
        c1, c2 = jax.jit(make(K1)), jax.jit(make(K2))
        float(c1(src)); float(c2(src))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        continue
    chains[name] = (c1, c2)
    print(f"compiled {name}", flush=True)

results = {n: [] for n in chains}
for e in range(EST):
    for name, (c1, c2) in chains.items():
        ts = []
        for cfn in (c1, c2):
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(cfn(src))
                reps.append(time.perf_counter() - t0)
            ts.append(sorted(reps)[1])
        results[name].append((ts[1] - ts[0]) / (K2 - K1) * 1e3)
    print(f"estimate {e} done", flush=True)

for name, es in results.items():
    es = sorted(es)
    print(f"  {name:22s} median {es[len(es)//2]:8.3f} ms  "
          f"[{es[0]:.3f}, {es[-1]:.3f}]", flush=True)
