"""Isolate the BasicBlock fusion pathology seen in bench_convs: the full
norm-free block (conv-lrelu-conv + 1x1 skip + add + lrelu) at 192x256
times 1.99 ms while its component convs sum to ~0.35 ms (4% vs ~25% MXU).

Incremental variants pinpoint which edge triggers the slow path, plus
candidate fixes (optimization_barrier, explicit padding, conv1x1-as-
matmul skip).

    python -m simplerecon_tpu.scripts.ab_block
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K1, K2, EST = 4, 64, 5

rng = np.random.RandomState(0)
bf16 = jnp.bfloat16
x0 = jnp.asarray(rng.randn(1, 192, 256, 192), bf16)
wa = jnp.asarray(rng.randn(3, 3, 192, 64) * 0.05, bf16)
wb = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, bf16)
ws = jnp.asarray(rng.randn(1, 1, 192, 64) * 0.05, bf16)


def conv(x, w, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def v_conv1(xi):
    return conv(xi, wa)


def v_conv1_lrelu(xi):
    return jax.nn.leaky_relu(conv(xi, wa), 0.2)


def v_conv1_lrelu_conv2(xi):
    return conv(jax.nn.leaky_relu(conv(xi, wa), 0.2), wb)


def v_two_convs_add(xi):
    # both convs read xi directly (multi-consumer input, no chain)
    return conv(xi, wa) + conv(xi, ws)


def v_full(xi):
    h = conv(jax.nn.leaky_relu(conv(xi, wa), 0.2), wb)
    return jax.nn.leaky_relu(h + conv(xi, ws), 0.2)


def v_full_barrier(xi):
    h = jax.lax.optimization_barrier(conv(xi, wa))
    h = jax.lax.optimization_barrier(conv(jax.nn.leaky_relu(h, 0.2), wb))
    idn = jax.lax.optimization_barrier(conv(xi, ws))
    return jax.nn.leaky_relu(h + idn, 0.2)


def v_full_skip_matmul(xi):
    h = conv(jax.nn.leaky_relu(conv(xi, wa), 0.2), wb)
    idn = jnp.einsum("bhwc,cd->bhwd", xi, ws[0, 0])
    return jax.nn.leaky_relu(h + idn, 0.2)


def v_full_explicit_pad(xi):
    def c3(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = c3(jax.nn.leaky_relu(c3(xi, wa), 0.2), wb)
    return jax.nn.leaky_relu(h + conv(xi, ws, pad="VALID"), 0.2)


def v_full_nofinal_lrelu(xi):
    h = conv(jax.nn.leaky_relu(conv(xi, wa), 0.2), wb)
    return h + conv(xi, ws)


VARIANTS = [
    ("conv1 only", v_conv1),
    ("conv1+lrelu", v_conv1_lrelu),
    ("conv1+lrelu+conv2", v_conv1_lrelu_conv2),
    ("conv1 + skip (no chain)", v_two_convs_add),
    ("FULL block", v_full),
    ("FULL w/ barriers", v_full_barrier),
    ("FULL skip-as-matmul", v_full_skip_matmul),
    ("FULL explicit pad", v_full_explicit_pad),
    ("FULL no final lrelu", v_full_nofinal_lrelu),
]


def chain(fn, kk):
    def run(x):
        def body(i, token):
            xi = jnp.maximum(
                x, (token - jnp.float32(3e4)
                    + i.astype(jnp.float32) * jnp.float32(1e-6)
                    ).astype(x.dtype))
            return jnp.sum(fn(xi).astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
    return run


chains = {}
for name, fn in VARIANTS:
    c1, c2 = jax.jit(chain(fn, K1)), jax.jit(chain(fn, K2))
    float(c1(x0)); float(c2(x0))
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
                float(cfn(x0))
                reps.append(time.perf_counter() - t0)
            ts.append(sorted(reps)[1])
        results[name].append((ts[1] - ts[0]) / (K2 - K1) * 1e3)
    print(f"estimate {e} done", flush=True)

for name, es in results.items():
    es = sorted(es)
    print(f"  {name:26s} median {es[len(es) // 2]:8.3f} ms  "
          f"[{es[0]:.3f}, {es[-1]:.3f}]", flush=True)
