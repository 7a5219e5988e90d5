"""Micro-benchmarks of the conv shapes that make up the b1 inference
residual (encoder / matching encoder / CVEncoder / decoder).

For each op: chained two-point on-device time (relay-cache-proof, see
bench.py), implied TFLOP/s vs the 197 TFLOP/s bf16 peak, and implied
HBM GB/s for the obviously memory-bound ops — so the optimization work
targets measured pathology, not guesses.

    python -m simplerecon_tpu.scripts.bench_convs [group]

group: all | decoder | matching | stem (default all)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import os

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0  # v5e


def _two_point(make_chain, args, k1=4, k2=64, repeats=3):
    c1 = jax.jit(make_chain(k1))
    c2 = jax.jit(make_chain(k2))
    float(c1(*args))
    float(c2(*args))

    def t(f):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    return (t(c2) - t(c1)) / (k2 - k1) * 1e3


def chain_over(fn, x0):
    """Nonlinear token perturbation (CLAUDE.md: additive tokens get
    hoisted through linear ops)."""
    def make(kk):
        def chain(x):
            def body(i, token):
                xi = jnp.maximum(
                    x, (token - jnp.float32(3e4)
                        + i.astype(jnp.float32) * jnp.float32(1e-6)
                        ).astype(x.dtype))
                return fn(xi)
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return chain
    return make, (x0,)


def report(name, ms, flops=0.0, bytes_moved=0.0):
    line = f"  {name:44s} {ms:8.3f} ms"
    if flops:
        tf = flops / (ms * 1e-3) / 1e12
        line += f"  {tf:7.2f} TF/s ({100 * tf / PEAK_TFLOPS:5.1f}% MXU)"
    if bytes_moved:
        gbps = bytes_moved / (ms * 1e-3) / 1e9
        line += f"  {gbps:7.1f} GB/s ({100 * gbps / HBM_GBPS:5.1f}% HBM)"
    print(line, flush=True)


def conv(x, w, stride=1, groups=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def main(group: str = "all"):
    rng = np.random.RandomState(0)
    bf16 = jnp.bfloat16

    def arr(*shape, dtype=bf16):
        return jnp.asarray(rng.randn(*shape), dtype)

    def wconv(kh, kw, cin, cout, dtype=bf16):
        return jnp.asarray(rng.randn(kh, kw, cin, cout) * 0.05, dtype)

    if group in ("all", "decoder"):
        print("decoder/CVEncoder shapes (b1):", flush=True)
        # row-0 workhorse: 3x3 64->64 at 192x256
        x = arr(1, 192, 256, 64)
        w = wconv(3, 3, 64, 64)
        fl = 2 * 192 * 256 * 9 * 64 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w).astype(jnp.float32)) * 1e-9, x)
        report("3x3 64->64 @192x256", _two_point(make, args), fl)

        # node input conv from concat: 3x3 192->64 at 192x256
        x3 = arr(1, 192, 256, 192)
        w3 = wconv(3, 3, 192, 64)
        fl = 2 * 192 * 256 * 9 * 192 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w3).astype(jnp.float32)) * 1e-9, x3)
        report("3x3 192->64 @192x256", _two_point(make, args), fl)

        # a full norm-free BasicBlock (conv-lrelu-conv + 1x1 skip + lrelu)
        wa, wb = wconv(3, 3, 192, 64), wconv(3, 3, 64, 64)
        ws = wconv(1, 1, 192, 64)

        def basic_block(xi):
            h = jax.nn.leaky_relu(conv(xi, wa), 0.2)
            h = conv(h, wb)
            idn = conv(xi, ws)
            return jnp.sum(jax.nn.leaky_relu(h + idn, 0.2)
                           .astype(jnp.float32)) * 1e-9
        fl = 2 * 192 * 256 * (9 * 192 * 64 + 9 * 64 * 64 + 192 * 64)
        make, args = chain_over(basic_block, x3)
        report("BasicBlock 192->64 @192x256", _two_point(make, args), fl)

        # CVEncoder ds_conv at 96x128: 3x3 64->64
        x4 = arr(1, 96, 128, 64)
        w4 = wconv(3, 3, 64, 64)
        fl = 2 * 96 * 128 * 9 * 64 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w4).astype(jnp.float32)) * 1e-9, x4)
        report("3x3 64->64 @96x128", _two_point(make, args), fl)

        # deep CVEncoder conv: 3x3 384->384 at 12x16
        x5 = arr(1, 12, 16, 384)
        w5 = wconv(3, 3, 384, 384)
        fl = 2 * 12 * 16 * 9 * 384 * 384
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w5).astype(jnp.float32)) * 1e-9, x5)
        report("3x3 384->384 @12x16", _two_point(make, args), fl)

        # upsample2x (slice+interleave path) at 96x128x64
        from simplerecon_tpu.ops.sampling import upsample2x
        make, args = chain_over(
            lambda xi: jnp.sum(upsample2x(xi).astype(jnp.float32)) * 1e-9,
            x4)
        nbytes = (96 * 128 + 192 * 256) * 64 * 2
        report("upsample2x @96x128x64", _two_point(make, args), 0, nbytes)

    if group in ("all", "matching"):
        print("matching encoder shapes (8 views):", flush=True)
        x = arr(8, 384, 512, 3)
        w = wconv(7, 7, 3, 64)
        fl = 2 * 8 * 192 * 256 * 49 * 3 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w, stride=2).astype(jnp.float32))
            * 1e-9, x)
        report("7x7/2 3->64 @384x512 x8", _two_point(make, args), fl)

        # space-to-depth equivalent: 4x4/2 12ch at 192x256 (the classic
        # TPU stem trick: exact same math after weight regrouping)
        xs = arr(8, 192, 256, 12)
        ws = wconv(4, 4, 12, 64)
        fl = 2 * 8 * 96 * 128 * 16 * 12 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, ws, stride=2).astype(jnp.float32))
            * 1e-9, xs)
        report("  s2d form: 4x4/2 12->64 @192x256 x8",
               _two_point(make, args), fl)

        # dense maxpool 2x2/1 at conv1 output
        xc = arr(8, 192, 256, 64)
        make, args = chain_over(
            lambda xi: jnp.sum(jax.lax.reduce_window(
                xi, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1),
                "VALID").astype(jnp.float32)) * 1e-9, xc)
        nbytes = 2 * 8 * 192 * 256 * 64 * 2
        report("maxpool 2x2/1 @192x256x64 x8", _two_point(make, args),
               0, nbytes)

        # blur-pool depthwise 4x4/2
        from simplerecon_tpu.models.matching_encoder import _blur_pool_4tap
        make, args = chain_over(
            lambda xi: jnp.sum(_blur_pool_4tap(xi).astype(jnp.float32))
            * 1e-9, xc)
        report("blurpool dw4x4/2 @192x256x64 x8", _two_point(make, args),
               0, nbytes)

        # layer1 BasicBlock conv at 96x128
        xl = arr(8, 96, 128, 64)
        wl = wconv(3, 3, 64, 64)
        fl = 2 * 8 * 96 * 128 * 9 * 64 * 64
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, wl).astype(jnp.float32)) * 1e-9, xl)
        report("3x3 64->64 @96x128 x8", _two_point(make, args), fl)

        # head instance_norm in fp32 vs bf16
        from simplerecon_tpu.models.layers import instance_norm
        xh = arr(8, 96, 128, 128)
        make, args = chain_over(
            lambda xi: jnp.sum(instance_norm(xi.astype(jnp.float32))
                               .astype(jnp.float32)) * 1e-9, xh)
        nbytes = 2 * 8 * 96 * 128 * 128 * 2
        report("instance_norm fp32 @96x128x128 x8",
               _two_point(make, args), 0, nbytes)

    if group in ("all", "stem"):
        print("EfficientNetV2-S shapes (b1):", flush=True)
        # fused-MBConv stage conv: 3x3 48->48 @96x128
        x = arr(1, 96, 128, 48)
        w = wconv(3, 3, 48, 48)
        fl = 2 * 96 * 128 * 9 * 48 * 48
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, w).astype(jnp.float32)) * 1e-9, x)
        report("3x3 48->48 @96x128", _two_point(make, args), fl)

        # depthwise 3x3 @24x32x1152 (late MBConv)
        xd = arr(1, 24, 32, 1152)
        wd = jnp.asarray(rng.randn(3, 3, 1, 1152) * 0.05, bf16)
        make, args = chain_over(
            lambda xi: jnp.sum(conv(xi, wd, groups=1152)
                               .astype(jnp.float32)) * 1e-9, xd)
        nbytes = 2 * 24 * 32 * 1152 * 2
        report("dw3x3 @24x32x1152", _two_point(make, args), 0, nbytes)

        # SE block global-pool + 2 tiny matmuls + scale @24x32x1152
        wse1 = jnp.asarray(rng.randn(1152, 48) * 0.05, bf16)
        wse2 = jnp.asarray(rng.randn(48, 1152) * 0.05, bf16)

        def se(xi):
            s = jnp.mean(xi.astype(jnp.float32), axis=(1, 2))
            s = jax.nn.sigmoid((jax.nn.silu(s.astype(bf16) @ wse1)
                                @ wse2).astype(jnp.float32))
            return jnp.sum((xi * s[:, None, None].astype(bf16))
                           .astype(jnp.float32)) * 1e-9
        make, args = chain_over(se, xd)
        report("SE block @24x32x1152", _two_point(make, args), 0, nbytes)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
