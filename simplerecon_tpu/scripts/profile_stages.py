"""Per-stage on-device timing of the hero forward pass.

Uses the same honesty harness as bench.py: K iterations chained inside
one jitted program (scalar-token dataflow dependency + per-iteration
index perturbation), completion forced by scalar readback, and two chain
lengths differenced to cancel the axon relay round-trip (~35-40 ms).

    python -m simplerecon_tpu.scripts.profile_stages [xla|pallas] [batch]

Prints one line per stage: ms/iter and the share of the total.
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


def _two_point(make_chain, args, k1=4, k2=36, repeats=5):
    # long chains: the two-point difference divides relay timing jitter
    # by (k2 - k1); round-5 found k2-k1=4 gave per-stage numbers whose
    # sum exceeded the measured total forward by ~2x.
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


def main(backend: str = "pallas", batch: int = 1):
    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options
    from simplerecon_tpu.parallel.train import make_example_batch

    opts = Options()
    opts.precision = "16"
    opts.cost_volume_backend = backend
    model = build_depth_model(opts)

    data = make_example_batch(opts, batch_size=batch)
    rng_np = np.random.RandomState(0)
    data["cur"]["image_b3hw"] = rng_np.randn(
        *data["cur"]["image_b3hw"].shape).astype("float32")
    data["src"]["image_b3hw"] = rng_np.randn(
        *data["src"]["image_b3hw"].shape).astype("float32")
    data = jax.tree_util.tree_map(jnp.asarray, data)
    cur, src = data["cur"], data["src"]

    init = jax.jit(lambda r, c, s: model.init(r, c, s, flip=False,
                                              train=False))
    variables = init(jax.random.PRNGKey(0), cur, src)

    h, w = opts.image_height, opts.image_width
    b = batch
    k = opts.model_num_views - 1
    dtype = jnp.bfloat16

    cur_image = jnp.transpose(cur["image_b3hw"], (0, 2, 3, 1)).astype(dtype)
    all_images = jnp.asarray(
        rng_np.randn(b * (k + 1), h, w, 3), dtype)
    mh, mw, mc = h // 4, w // 4, opts.matching_feature_dims
    matching_feats = jnp.asarray(
        rng_np.randn(b, k + 1, mh, mw, mc), dtype)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, k, 4, 4))
    K_m = cur[f"K_s{opts.matching_scale}_b44"] \
        if f"K_s{opts.matching_scale}_b44" in cur else None
    src_K = src[f"K_s{opts.matching_scale}_b44"].astype(jnp.float32)
    cur_invK = cur[f"invK_s{opts.matching_scale}_b44"].astype(jnp.float32)

    def chain_over(fn, x0):
        """make_chain factory: fn(maximum(x, token)) -> scalar.

        maximum() rather than +: an additive token distributes through
        the first (linear) conv and lets XLA hoist the loop-invariant
        part out of the chain (CLAUDE.md harness rule)."""
        def make(kk):
            def chain(variables, x):
                def body(i, token):
                    xi = jnp.maximum(
                        x, (token - jnp.float32(30.0)
                            + i.astype(jnp.float32) * jnp.float32(1e-6)
                            ).astype(x.dtype))
                    return fn(variables, xi)
                return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
            return chain
        return make, (variables, x0)

    stages = {}

    # 1) image-prior encoder
    def run_encoder(variables, x):
        feats = model.apply(variables, x, False,
                            method=lambda m, img, t: m.encoder(img, t))
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-9
    make, args = chain_over(run_encoder, cur_image)
    stages["encoder(EffNetV2-S)"] = _two_point(make, args)

    # 2) matching encoder over all views
    def run_matching(variables, x):
        f = model.apply(variables, x, False,
                        method=lambda m, img, t: m.matching_model(img, t))
        return jnp.sum(f.astype(jnp.float32)) * 1e-9
    make, args = chain_over(run_matching, all_images)
    stages[f"matching_encoder x{k + 1}"] = _two_point(make, args)

    # 3) cost volume
    def run_cv(variables, feats):
        cv, lowest, _, _ = model.apply(
            variables, feats[:, 0], feats[:, 1:], False,
            method=lambda m, c, s, t: m.cost_volume(
                c, s, src_extrinsics_bk44=eye, src_poses_bk44=eye,
                src_Ks_bk44=src_K, cur_invK_b44=cur_invK,
                return_mask=False))
        return jnp.sum(cv.astype(jnp.float32)) * 1e-9
    make, args = chain_over(run_cv, matching_feats)
    stages[f"cost_volume({backend})"] = _two_point(make, args)

    # 4) full forward (for the total + implied residual decoder cost)
    def run_full(variables, img):
        c2 = dict(cur)
        c2["image_b3hw"] = img
        out = model.apply(variables, c2, src, flip=False, train=False)
        return jnp.mean(out["depth_pred_s0_bhw1"].astype(jnp.float32))
    make, args = chain_over(run_full, cur["image_b3hw"])
    stages["TOTAL forward"] = _two_point(make, args)

    # 5) cv_encoder + decoder, separately (the round-4 residual split).
    # Inputs synthesized at the real shapes: encoder taps at strides
    # 2..32, cost volume at the matching resolution.
    m = opts.matching_scale
    from simplerecon_tpu.models.efficientnet import EfficientNetV2Features
    enc_dims = EfficientNetV2Features().num_ch_enc
    enc_feats = [
        jnp.asarray(rng_np.randn(b, h // (2 ** (i + 1)),
                                 w // (2 ** (i + 1)), ch), dtype)
        for i, ch in enumerate(enc_dims)]
    cv_bhwd = jnp.asarray(
        rng_np.randn(b, mh, mw, opts.matching_num_depth_bins), dtype)

    def run_cv_enc(variables, x):
        feats = model.apply(
            variables, x, [f.astype(x.dtype) for f in enc_feats[m:]],
            False,
            method=lambda mm, cv, fe, t: mm.cost_volume_net(cv, fe, t))
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats) * 1e-9
    make, args = chain_over(run_cv_enc, cv_bhwd)
    stages["cv_encoder"] = _two_point(make, args)

    cv_feat_dims = model.cv_encoder_ch
    cv_feats_syn = [
        jnp.asarray(rng_np.randn(b, mh // (2 ** i), mw // (2 ** i), ch),
                    dtype)
        for i, ch in enumerate(cv_feat_dims)]

    def run_decoder(variables, x):
        dec_in = [x] + cv_feats_syn
        out = model.apply(
            variables, dec_in, False,
            method=lambda mm, f, t: mm.depth_decoder(f, t))
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in out.values()) * 1e-9
    make, args = chain_over(run_decoder, enc_feats[0])
    stages["decoder(UNet++)"] = _two_point(make, args)

    total = stages["TOTAL forward"]
    known = sum(v for s, v in stages.items()
                if s not in ("TOTAL forward", "cv_encoder",
                             "decoder(UNet++)"))
    print(f"\nbackend={backend} batch={batch} "
          f"({w}x{h}, {opts.matching_num_depth_bins} planes, "
          f"{k + 1} views)")
    for s, v in stages.items():
        print(f"  {s:28s} {v:9.3f} ms  ({100 * v / total:5.1f}% of total)")
    print(f"  {'residual (cv_enc+decoder)':28s} {total - known:9.3f} ms")


if __name__ == "__main__":
    be = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    main(be, bs)
