"""On-device per-stage timing of the TRAIN step (fwd+bwd), hero shapes.

Complements `profile_stages.py` (forward-only split): times each big
submodule's fwd+bwd in isolation with the chained two-point harness, so
the train-step budget (bench.py BENCH_MODE=train) can be attributed:

    python -m simplerecon_tpu.scripts.profile_train_stages [batch]

Stages (hero geometry, bf16 compute, grads w.r.t. params like training):
  * image-prior encoder (EfficientNetV2-S) on (b, 384, 512, 3)
  * matching encoder (ResNet) on (b*8, 384, 512, 3)
  * fused cost-volume sweep (see also bench_warp grad:/cvjp: configs)
  * CVEncoder + UNet++ decoder on the (b, 192, 256, 64) volume
  * losses (4-scale + gradient + normals + MV) from fixed outputs

Timing rules (CLAUDE.md): iterations are chained through a nonlinear
`maximum()` token so the axon relay cannot serve cached results and XLA
cannot hoist loop-invariant work.
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

from simplerecon_tpu import losses as loss_lib
from simplerecon_tpu.models.decoders import CVEncoder, DepthDecoderPP
from simplerecon_tpu.models.efficientnet import EfficientNetV2Features
from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder
from simplerecon_tpu.ops import cost_volume as cv_ops


def _two_point(make_chain, args, k1=2, k2=6, repeats=3):
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


def _chain_grad(loss_of, x0):
    """Chain maker: perturb x with the token, take grad-of-loss, reduce
    grads to the next token. loss_of(x) must be NONLINEAR in x."""

    def make_chain(kk):
        def chain(x):
            def body(i, token):
                xi = jnp.maximum(
                    x, (token - jnp.float32(5.0)
                        + i.astype(jnp.float32) * jnp.float32(1e-6)
                        ).astype(x.dtype))
                val, g = jax.value_and_grad(loss_of)(xi)
                return val * jnp.float32(1e-9) + jnp.sum(
                    jnp.abs(g).astype(jnp.float32)) * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, kk, body, jnp.float32(0.0))
        return chain

    return make_chain, (x0,)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    f32, bf16 = jnp.float32, jnp.bfloat16
    h, w = 384, 512
    dh, dw = h // 2, w // 2
    results = {}

    # ---- image-prior encoder --------------------------------------
    img = jnp.asarray(rng.randn(b, h, w, 3), bf16)
    enc = EfficientNetV2Features(dtype=bf16)
    vs = jax.jit(lambda r, x: enc.init(r, x, False))(
        jax.random.PRNGKey(0), img)

    def enc_loss(x):
        feats = enc.apply(vs, x, False)
        return sum(jnp.sum(f.astype(f32) ** 2) for f in feats)

    results["encoder"] = _two_point(*_chain_grad(enc_loss, img))

    # ---- matching encoder (8 views) -------------------------------
    imgs8 = jnp.asarray(rng.randn(b * 8, h, w, 3), bf16)
    match = ResnetMatchingEncoder(num_ch_out=16, dtype=bf16)
    vm = jax.jit(lambda r, x: match.init(r, x, False))(
        jax.random.PRNGKey(0), imgs8)

    def match_loss(x):
        out = match.apply(vm, x, False)
        return jnp.sum(out.astype(f32) ** 2)

    results["matching_x8"] = _two_point(*_chain_grad(match_loss, imgs8))

    # ---- fused cost-volume sweep (fwd+bwd) ------------------------
    k, mh, mw, c, d = 7, 96, 128, 16, 64
    src = jnp.asarray(rng.randn(b, k, mh, mw, c), bf16)
    cur = jnp.asarray(rng.randn(b, mh * mw, c), bf16)

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
    Km[0, 2], Km[1, 2] = mw / 2, mh / 2
    src_K = jnp.asarray(np.broadcast_to(Km, (b, k, 4, 4)).copy())
    invK = jnp.asarray(np.broadcast_to(np.linalg.inv(Km),
                                       (b, 4, 4)).copy())
    ex = jnp.asarray(ex)
    planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)
    penalty = jnp.asarray(rng.rand(b, k, 3).astype(np.float32))
    loc = ex[:, :, :3, 3]
    cin = c * (1 + k) + (1 + k) + 3 * (1 + k) + 3 * k + 3 * k
    mlp = ((jnp.asarray(rng.randn(cin, 128) * 0.05, f32),
            jnp.zeros((128,), f32)),
           (jnp.asarray(rng.randn(128, 128) * 0.05, f32),
            jnp.zeros((128,), f32)),
           (jnp.asarray(rng.randn(128, 1) * 0.05, f32),
            jnp.zeros((1,), f32)))

    def cv_loss(s):
        # the SHIPPED training path: fwd AND bwd as banded Pallas
        # kernels (cost_volume_custom_vjp="pallas_bwd", the default) —
        # calling sweep_mlp_volume without custom_vjp would time the
        # checkpointed-autodiff backward instead (687 ms vs the full
        # 544 ms step at b16, round-5 measurement).
        vol = cv_ops.sweep_mlp_volume(
            s, cur, ex, src_K, invK, planes, penalty, loc, mlp,
            compute_dtype=bf16, custom_vjp="pallas_bwd")
        return jnp.sum(vol.astype(f32))

    results["cv_sweep"] = _two_point(*_chain_grad(cv_loss, src))

    # ---- CVEncoder + decoder --------------------------------------
    # the cost volume lives at the matching scale (1/4 res); the
    # decoder's finest skip (feats[0]) and the depth outputs are at 1/2
    vol = jnp.asarray(rng.randn(b, h // 4, w // 4, d), bf16)
    enc_ch = (24, 48, 64, 160, 256)
    feats = [jnp.asarray(rng.randn(b, h // s, w // s, ch), bf16)
             for s, ch in zip((2, 4, 8, 16, 32), enc_ch)]
    cve = CVEncoder(num_ch_outs=(64, 128, 256, 384), dtype=bf16)
    vc = jax.jit(lambda r: cve.init(r, vol, feats[1:], False))(
        jax.random.PRNGKey(0))
    dec = DepthDecoderPP(dtype=bf16)

    def make_dec_vars(cv_outs):
        return jax.jit(lambda r: dec.init(
            r, [feats[0]] + list(cv_outs), False))(jax.random.PRNGKey(0))

    cv_outs0 = jax.jit(lambda: cve.apply(vc, vol, feats[1:], False))()
    vd = make_dec_vars(cv_outs0)

    def dec_loss(v):
        cv_outs = cve.apply(vc, v, feats[1:], False)
        outs = dec.apply(vd, [feats[0]] + list(cv_outs), False)
        return sum(jnp.sum(o.astype(f32) ** 2) for o in outs.values())

    results["cv_enc+decoder"] = _two_point(*_chain_grad(dec_loss, vol))

    # ---- losses ----------------------------------------------------
    depth_gt = jnp.asarray(1.0 + rng.rand(b, dh, dw), f32)
    mask_b = jnp.asarray(rng.rand(b, dh, dw) > 0.1)
    invK0 = jnp.asarray(np.broadcast_to(np.linalg.inv(Km),
                                        (b, 4, 4)).copy())
    eye = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                      (b, 4, 4)).copy())
    eye_k = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (b, k, 4, 4)).copy())
    Kk = jnp.asarray(np.broadcast_to(Km, (b, k, 4, 4)).copy())
    src_depth = jnp.asarray(1.0 + rng.rand(b, k, dh, dw), f32)
    log_preds = {}
    for i in range(4):
        log_preds[i] = jnp.asarray(
            0.2 * rng.randn(b, dh // 2 ** i, dw // 2 ** i, 1), f32)

    from simplerecon_tpu.ops import geometry as geo

    def losses_loss(lp0):
        outputs = {}
        for i in range(4):
            lp = lp0 if i == 0 else log_preds[i]
            outputs[f"log_depth_pred_s{i}_bhw1"] = lp
            outputs[f"depth_pred_s{i}_bhw1"] = jnp.exp(
                jnp.clip(lp, -8.0, 8.0))
        outputs["normals_pred_bhw3"] = geo.normals_from_depth(
            outputs["depth_pred_s0_bhw1"][..., 0], invK0)
        gt_normals = geo.normals_from_depth(
            jnp.where(mask_b, depth_gt, jnp.nan), invK0)
        cur_data = {"depth_bhw": depth_gt, "mask_b_bhw": mask_b,
                    "normals_bhw3": gt_normals, "invK_s0_b44": invK0,
                    "world_T_cam_b44": eye}
        src_data = {"depth_bkhw": src_depth, "K_s0_bk44": Kk,
                    "cam_T_world_bk44": eye_k}
        return loss_lib.compute_losses(cur_data, src_data,
                                       outputs)["loss"]

    results["losses"] = _two_point(*_chain_grad(losses_loss,
                                                log_preds[0]))

    total = sum(results.values())
    for name, ms in results.items():
        print(f"  b{b} {name:16s} {ms:8.2f} ms", flush=True)
    print(f"  b{b} {'SUM':16s} {total:8.2f} ms "
          "(vs bench.py BENCH_MODE=train for the unattributed rest)")


if __name__ == "__main__":
    main()
