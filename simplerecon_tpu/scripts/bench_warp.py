"""On-device micro-benchmark of the plane-sweep warp configurations.

Same honesty harness as bench.py (chained iterations inside one jitted
program, two chain lengths differenced). Hero shapes by default:
(b, k, h, w, c) = (1, 7, 96, 128, 16) bf16, 64 planes.

    python -m simplerecon_tpu.scripts.bench_warp [batch] [cfg ...]

cfg strings: "gather", or "[mlp:][x:|y:]tile_h,tile_w,band[,unroll]"
e.g. "x:96,32,48" (column-banded warp), "y:8,128,16" (row-stripe
y-banded warp), "mlp:y:8,128,16,2" (full fused sweep_mlp_volume with a
202-ch MLP — the xla_fused hot loop). Axis defaults to "y".
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import os

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from simplerecon_tpu.ops import cost_volume as cv_ops


def _two_point(make_chain, args, k1=2, k2=8, repeats=3):
    c1 = jax.jit(make_chain(k1))
    c2 = jax.jit(make_chain(k2))
    float(c1(*args))
    float(c2(*args))

    def timed(fn):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append((time.perf_counter() - t0) * 1e3)
        return sorted(ts)[len(ts) // 2]

    return (timed(c2) - timed(c1)) / (k2 - k1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfgs = sys.argv[2:] or ["x:96,32,40", "y:8,128,16", "y:4,128,16",
                            "y:16,128,24", "mlp:x:96,32,40,2",
                            "mlp:y:8,128,16,2", "mlp:y:8,128,16,4"]

    b, k, h, w, c, d = batch, 7, 96, 128, 16, 64
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.bfloat16)

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

    # fused-path extras: reference cur features, pose metadata, MLP
    cur_feats = jnp.asarray(rng.randn(b, h * w, c), jnp.bfloat16)
    penalty = jnp.asarray(rng.rand(b, k, 3).astype(np.float32))
    loc = jnp.asarray(ex)[:, :, :3, 3]
    cin = c * (1 + k) + (1 + k) + 3 * (1 + k) + 3 * k + k + k + k
    mlp = (((jnp.asarray(rng.randn(cin, 128) * 0.05, jnp.float32)),
            jnp.zeros((128,), jnp.float32)),
           ((jnp.asarray(rng.randn(128, 128) * 0.05, jnp.float32)),
            jnp.zeros((128,), jnp.float32)),
           ((jnp.asarray(rng.randn(128, 1) * 0.05, jnp.float32)),
            jnp.zeros((1,), jnp.float32)))

    for cfg in cfgs:
        if cfg == "gather":
            fn = lambda s: cv_ops.sweep_warp(  # noqa: E731
                s, ex, src_K, invK, planes, backend="gather")
            label = "gather"
        elif cfg.startswith("pallas:"):
            from simplerecon_tpu.ops import pallas_cv
            th, tw, band = (int(v) for v in cfg[7:].split(","))

            def fn(s, th=th, tw=tw, band=band):
                (w0, b0), (w1, b1), (w2, b2) = mlp
                return pallas_cv.banded_warp_feature_volume(
                    s, cur_feats, ex, src_K, invK, planes, penalty, loc,
                    w0.astype(jnp.bfloat16), b0, w1.astype(jnp.bfloat16),
                    b1, w2.astype(jnp.bfloat16), b2,
                    tile_h=th, tile_w=tw, bands=(band,))
            label = f"pallas tile=({th},{tw}) band={band}"
        else:
            spec = cfg
            use_grad = spec.startswith("grad:")      # fwd+bwd of the
            if use_grad:                             # fused sweep
                spec = spec[5:]
            use_cvjp = spec.startswith("cvjp:")      # grad w/ custom VJP
            if use_cvjp:
                spec = spec[5:]
            use_pjp = spec.startswith("pjp:")        # custom VJP with
            if use_pjp:                              # pallas forward
                spec = spec[4:]
                use_cvjp = True
            use_pbwd = spec.startswith("pbwd:")      # pallas fwd+bwd
            if use_pbwd:                             # kernels
                spec = spec[5:]
                use_cvjp = True
            use_mlp = use_grad or use_cvjp or spec.startswith("mlp:")
            if spec.startswith("mlp:"):
                spec = spec[4:]
            axis = "y"
            if spec[:2] in ("x:", "y:"):
                axis = spec[0]
                spec = spec[2:]
            parts = [int(v) for v in spec.split(",")]
            th, tw, band = parts[:3]
            unroll = parts[3] if len(parts) > 3 else (2 if use_mlp else 1)

            if use_grad or use_cvjp:
                # fwd+bwd of the fused sweep: grads w.r.t. src features,
                # cur features and MLP params (the training cost). The
                # loss is nonlinear in src (dots -> MLP), so the chained
                # perturbation cannot be hoisted.
                def fn(s, th=th, tw=tw, band=band, unroll=unroll,
                       axis=axis,
                       custom=("pallas_bwd" if use_pbwd else
                               "pallas" if use_pjp else use_cvjp)):
                    def loss(s_, cur_, mlp_):
                        return jnp.sum(cv_ops.sweep_mlp_volume(
                            s_, cur_, ex, src_K, invK, planes, penalty,
                            loc, mlp_, compute_dtype=jnp.bfloat16,
                            tile_h=th, tile_w=tw, x_band=band,
                            unroll=unroll, band_axis=axis,
                            custom_vjp=custom).astype(jnp.float32))
                    # value_and_grad, and the value feeds the result:
                    # with grad() alone the primal output is dead and
                    # XLA deletes the entire forward pass from the
                    # timed program (bwd-only numbers)
                    val, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
                        s, cur_feats, mlp)
                    return val + sum(jnp.sum(le.astype(jnp.float32))
                                     for le in jax.tree_util.tree_leaves(g))
            elif use_mlp:
                def fn(s, th=th, tw=tw, band=band, unroll=unroll,
                       axis=axis):
                    return cv_ops.sweep_mlp_volume(
                        s, cur_feats, ex, src_K, invK, planes, penalty,
                        loc, mlp, compute_dtype=jnp.bfloat16,
                        tile_h=th, tile_w=tw, x_band=band, unroll=unroll,
                        band_axis=axis)
            else:
                def fn(s, th=th, tw=tw, band=band, unroll=unroll,
                       axis=axis):
                    return cv_ops.sweep_warp_matmul(
                        s, ex, src_K, invK, planes, tile_h=th, tile_w=tw,
                        x_band=band, unroll=unroll, band_axis=axis)
            kind = ("pbwd " if use_pbwd else
                    "pjp " if use_pjp else
                    "cvjp " if use_cvjp else
                    "grad " if use_grad else
                    "mlp " if use_mlp else "")
            label = (f"{kind}{axis}-band "
                     f"tile=({th},{tw}) band={band} u{unroll}")

        def make_chain(kk, fn=fn):
            def chain(s):
                def body(i, token):
                    # maximum(), not + : the warp is LINEAR in the source
                    # features, so an additive token distributes through
                    # it and XLA can hoist the loop-invariant warp(s) out
                    # of the chain (the round-2 calibration trap).
                    si = jnp.maximum(
                        s, (token - jnp.float32(5.0) +
                            i.astype(jnp.float32) * jnp.float32(1e-6)
                            ).astype(s.dtype))
                    out = fn(si)
                    arr = (out.sampled_bkdNc
                           if hasattr(out, "sampled_bkdNc") else out)
                    return jnp.sum(arr.astype(jnp.float32)
                                   ) * jnp.float32(1e-9)
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return chain

        try:
            ms = _two_point(make_chain, (src,))
            print(f"  b{batch} {label:32s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  b{batch} {label:32s} FAILED: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
