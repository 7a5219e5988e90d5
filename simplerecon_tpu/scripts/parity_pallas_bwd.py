"""On-chip gradient-accuracy parity: pallas_bwd vs autodiff.

Evidence script for the STATUS.md claim that the fused sweep's Pallas
backward kernel produces bf16 gradients ~20x closer to the fp32 truth
than bf16 XLA autodiff (fp32 in-kernel accumulation preserves the
cancellation-heavy MLP weight-grad sums). Run on the real TPU:

    python -m simplerecon_tpu.scripts.parity_pallas_bwd

Prints the f32 pallas_bwd-vs-autodiff parity plus both bf16 paths'
worst-leaf relative error against the f32 reference.
"""
import jax, jax.numpy as jnp, numpy as np
from simplerecon_tpu.ops import cost_volume as cv_ops

b, k, h, w, c, d = 1, 7, 96, 128, 16, 64
rng = np.random.RandomState(0)
src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
def rot(t):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[2, 2] = np.cos(t); m[0, 2] = np.sin(t); m[2, 0] = -np.sin(t)
    return m
ex = np.stack([rot(0.04 * i) for i in range(k)])[None]
ex = np.broadcast_to(ex, (b, k, 4, 4)).copy()
ex[..., 0, 3] = np.linspace(-0.15, 0.15, k)
Km = np.eye(4, dtype=np.float32); Km[0, 0] = Km[1, 1] = 120.0
Km[0, 2], Km[1, 2] = w / 2, h / 2
src_K = jnp.asarray(np.broadcast_to(Km, (b, k, 4, 4)).copy())
invK = jnp.asarray(np.broadcast_to(np.linalg.inv(Km), (b, 4, 4)).copy())
ex = jnp.asarray(ex)
planes = cv_ops.generate_depth_planes(b, d, 0.25, 5.0)
cur = jnp.asarray(rng.randn(b, h * w, c), jnp.float32)
pen = jnp.asarray(rng.rand(b, k, 3).astype(np.float32))
loc = ex[:, :, :3, 3]
cin = c * (1 + k) + (1 + k) + 3 * (1 + k) + 3 * k + 3 * k
mlp = ((jnp.asarray(rng.randn(cin, 128) * 0.05, jnp.float32), jnp.zeros(128, jnp.float32)),
       (jnp.asarray(rng.randn(128, 128) * 0.05, jnp.float32), jnp.zeros(128, jnp.float32)),
       (jnp.asarray(rng.randn(128, 1) * 0.05, jnp.float32), jnp.zeros(1, jnp.float32)))

def make_loss(cvjp, dt):
    def loss(s, cu, m):
        out = cv_ops.sweep_mlp_volume(
            s, cu, ex, src_K, invK, planes, pen, loc, m,
            compute_dtype=dt, tile_h=8, tile_w=128, x_band=16,
            band_axis="y", custom_vjp=cvjp)
        return jnp.sum(jnp.sin(out.astype(jnp.float32) * 0.3))
    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

def rels(ga, gb, tag):
    worst = 0.0
    for a, bl in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        a = np.asarray(a, np.float64); bl = np.asarray(bl, np.float64)
        r = np.linalg.norm(a - bl) / max(np.linalg.norm(a), 1e-12)
        worst = max(worst, r)
    print(f"{tag}: worst-leaf rel {worst:.3e}")
    return worst

v32, g32 = make_loss(False, jnp.float32)(src, cur, mlp)
vp32, gp32 = make_loss("pallas_bwd", jnp.float32)(src, cur, mlp)
print("f32 loss", float(v32), float(vp32))
rels(g32, gp32, "f32: pallas_bwd vs autodiff")
vb, gb = make_loss(False, jnp.bfloat16)(src, cur, mlp)
vpb, gpb = make_loss("pallas_bwd", jnp.bfloat16)(src, cur, mlp)
rels(g32, gb, "bf16 autodiff vs f32 truth")
rels(g32, gpb, "bf16 pallas_bwd vs f32 truth")
