"""End-to-end golden test of the metadata feature volume against an
independent torch replica of the reference `FeatureVolumeManager`
(`/root/reference/modules/cost_volume.py:383-736`).

The replica re-derives, in torch NCHW, the full reference behavior:
+0.5-centered backprojection, K@E projection with the Kornia-style
eps-safe divide (projected depth = z + eps), `F.grid_sample`
(bilinear, zeros padding, align_corners=False), DVMVS pose distance,
normalized rays, cosine ray angles (eps=1e-5), masked dot products, the
exact 202-channel metadata order
  [src feats (k*c) | ref feats (c)] mask(k) depths(k) plane(1) dot(k)
  angle(k) [ref ray(3) | src rays(k*3)] penalty(k) R(k) t(k)
and the Linear+LeakyReLU(0.01) MLP. Passing this test pins both the
numerics and the channel layout that the reference-checkpoint converter
relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from simplerecon_tpu.models.cost_volume import MLPFeatureVolume

B, K, C, H, W, D = 1, 3, 8, 16, 24, 8
MIN_D, MAX_D = 0.5, 4.0


def _geometry():
    rng = np.random.RandomState(7)

    def rot(ax, t):
        cs, sn = np.cos(t), np.sin(t)
        m = np.eye(4, dtype=np.float64)
        i, j = [(1, 2), (0, 2), (0, 1)][ax]
        m[i, i] = cs
        m[j, j] = cs
        m[i, j] = sn
        m[j, i] = -sn
        return m

    poses = []
    for vi in range(K):
        m = rot(0, 0.05 * (vi - 1)) @ rot(1, 0.08 * vi) @ rot(2, 0.03 * vi)
        m[:3, 3] = rng.uniform(-0.2, 0.2, 3)
        poses.append(m)
    poses = np.stack(poses)[None].astype(np.float64)      # cur_T_src
    extr = np.linalg.inv(poses)                           # src_T_cur
    Kmat = np.eye(4)
    Kmat[0, 0], Kmat[1, 1] = 18.0, 17.0
    Kmat[0, 2], Kmat[1, 2] = W / 2 - 0.3, H / 2 + 0.2
    Ks = np.broadcast_to(Kmat, (B, K, 4, 4)).copy()
    invK = np.linalg.inv(Kmat)[None].copy()
    return (extr.astype(np.float32), poses.astype(np.float32),
            Ks.astype(np.float32), invK.astype(np.float32))


def _torch_reference_volume(cur_bchw, src_bkchw, extr, poses, Ks, invK,
                            planes_bd, mlp_params):
    b, k, c, h, w = src_bkchw.shape
    d = planes_bd.shape[1]
    n = h * w
    eps = 1e-8

    xx, yy = torch.meshgrid(torch.arange(w), torch.arange(h), indexing="xy")
    pix = torch.stack((xx, yy), 0).float() + 0.5
    pix_13N = torch.cat([pix.flatten(1), torch.ones(1, n)], 0)[None]

    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    trace = R.diagonal(dim1=-1, dim2=-2).sum(-1)
    r_meas = torch.sqrt(2 * (1 - torch.clamp(trace, max=3.0) / 3))
    t_meas = t.norm(dim=-1)
    penalty = torch.sqrt(t_meas ** 2 + r_meas ** 2)       # (b, k)

    def run_mlp(x_bhwc):
        y = x_bhwc
        for li, (wt, bias) in enumerate(mlp_params):
            y = y @ wt.T + bias
            if li < len(mlp_params) - 1:
                y = F.leaky_relu(y, 0.01)
        return y

    uv_scale = torch.tensor([1.0 / w, 1.0 / h]).view(1, 1, 1, 2)
    planes_out = []
    for di in range(d):
        depth = planes_bd[:, di].view(b, 1, 1)
        cam_pts = invK[:, :3, :3] @ pix_13N.expand(b, 3, n)
        world_b3N = cam_pts * depth

        warped, masks, depths_l, dots, src_rays, angles = \
            [], [], [], [], [], []
        cur_rays = F.normalize(world_b3N, dim=1)          # (b, 3, N)
        for vi in range(k):
            P = (Ks[:, vi] @ extr[:, vi])[:, :3]
            cp = P @ torch.cat([world_b3N, torch.ones(b, 1, n)], 1)
            z = cp[:, 2:] + eps
            nonzero = cp[:, 2:].abs() > eps
            scale = torch.where(nonzero, 1.0 / z, torch.ones_like(z))
            uv = (cp[:, :2] * scale).permute(0, 2, 1).view(b, h, w, 2)
            grid = 2 * uv * uv_scale - 1
            sampled = F.grid_sample(src_bkchw[:, vi], grid,
                                    mode="bilinear", padding_mode="zeros",
                                    align_corners=False)
            mask = (z > 0).float().view(b, 1, h, w)
            warped.append(sampled)
            masks.append(mask)
            depths_l.append(z.view(b, 1, h, w))
            dots.append((sampled * cur_bchw).sum(1, keepdim=True)
                        * mask)
            sray = F.normalize(
                world_b3N - poses[:, vi, :3, 3][:, :, None], dim=1)
            src_rays.append(sray.view(b, 3, h, w))
            angles.append(F.cosine_similarity(
                cur_rays, sray, dim=1, eps=1e-5).view(b, 1, h, w))

        feats = torch.cat(
            warped + [cur_bchw]
            + masks + depths_l
            + [depth.view(b, 1, 1, 1).expand(b, 1, h, w)]
            + dots + angles
            + [cur_rays.view(b, 3, h, w)] + src_rays
            + [penalty[:, :, None, None].expand(b, k, h, w),
               r_meas[:, :, None, None].expand(b, k, h, w),
               t_meas[:, :, None, None].expand(b, k, h, w)], dim=1)

        out = run_mlp(feats.permute(0, 2, 3, 1))          # (b, h, w, 1)
        planes_out.append(out[..., 0])
    return torch.stack(planes_out, dim=1)                 # (b, d, h, w)


def test_feature_volume_matches_torch_reference_replica():
    rng = np.random.RandomState(11)
    cur = rng.randn(B, H, W, C).astype(np.float32)
    src = rng.randn(B, K, H, W, C).astype(np.float32)
    extr, poses, Ks, invK = _geometry()

    ref = None
    for backend in ("xla", "xla_fused"):
        mod = MLPFeatureVolume(num_depth_bins=D, min_depth=MIN_D,
                               max_depth=MAX_D, matching_dim_size=C,
                               num_source_views=K, mlp_hidden=(16, 16),
                               backend=backend, dtype=jnp.float32)
        with jax.default_matmul_precision("highest"):
            variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(cur),
                                 jnp.asarray(src), jnp.asarray(extr),
                                 jnp.asarray(poses), jnp.asarray(Ks),
                                 jnp.asarray(invK))
            vol_bhwd, _, planes_bd, _ = mod.apply(
                variables, jnp.asarray(cur), jnp.asarray(src),
                jnp.asarray(extr), jnp.asarray(poses), jnp.asarray(Ks),
                jnp.asarray(invK))

        if ref is None:
            mlp_params = []
            p = variables["params"]["mlp"]
            for name in sorted(p.keys()):  # dense0, dense1, dense2
                mlp_params.append(
                    (torch.from_numpy(np.asarray(p[name]["kernel"]).T),
                     torch.from_numpy(np.asarray(p[name]["bias"]))))
            ref = _torch_reference_volume(
                torch.from_numpy(cur).permute(0, 3, 1, 2),
                torch.from_numpy(src).permute(0, 1, 4, 2, 3),
                torch.from_numpy(extr), torch.from_numpy(poses),
                torch.from_numpy(Ks), torch.from_numpy(invK),
                torch.from_numpy(np.asarray(planes_bd)),
                mlp_params).numpy()

        ours = np.asarray(vol_bhwd).transpose(0, 3, 1, 2)  # (b, d, h, w)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=backend)


def test_feature_volume_backend_gradient_parity():
    """xla and xla_fused must produce identical gradients (params AND
    inputs) — the fused path's scan/cond/map/checkpoint structure is an
    implementation detail, not a different function."""
    rng = np.random.RandomState(11)
    cur = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    src = jnp.asarray(rng.randn(B, K, H, W, C).astype(np.float32))
    extr, poses, Ks, invK = map(jnp.asarray, _geometry())

    grads = {}
    with jax.default_matmul_precision("highest"):
        for backend in ("xla", "xla_fused"):
            mod = MLPFeatureVolume(num_depth_bins=D, min_depth=MIN_D,
                                   max_depth=MAX_D, matching_dim_size=C,
                                   num_source_views=K, mlp_hidden=(16, 16),
                                   backend=backend, dtype=jnp.float32)
            variables = mod.init(jax.random.PRNGKey(0), cur, src, extr,
                                 poses, Ks, invK)

            def loss(params, cur, src, mod=mod):
                v, _, _, _ = mod.apply({"params": params}, cur, src,
                                       extr, poses, Ks, invK)
                return jnp.mean(v ** 2)

            grads[backend] = jax.grad(loss, argnums=(0, 1, 2))(
                variables["params"], cur, src)

    flat_a = jax.tree_util.tree_leaves(grads["xla"])
    flat_b = jax.tree_util.tree_leaves(grads["xla_fused"])
    assert len(flat_a) == len(flat_b)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-6)


def test_feature_volume_pallas_kernels_match_torch_replica():
    """The fused Pallas kernels (interpret mode) must ALSO match the
    torch replica — covering the in-kernel projection/metadata path."""
    rng = np.random.RandomState(12)
    cur = rng.randn(B, H, W, C).astype(np.float32)
    src = rng.randn(B, K, H, W, C).astype(np.float32)
    extr, poses, Ks, invK = _geometry()

    ref = None
    with jax.default_matmul_precision("highest"):
        for backend in ("pallas_interpret", "pallas_full_interpret",
                        "pallas_v1_interpret"):
            mod = MLPFeatureVolume(num_depth_bins=D, min_depth=MIN_D,
                                   max_depth=MAX_D, matching_dim_size=C,
                                   num_source_views=K, mlp_hidden=(16, 16),
                                   backend=backend, pallas_tile=H * W,
                                   pallas_warp_tile=H * W,
                                   dtype=jnp.float32)
            variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(cur),
                                 jnp.asarray(src), jnp.asarray(extr),
                                 jnp.asarray(poses), jnp.asarray(Ks),
                                 jnp.asarray(invK))
            vol_bhwd, _, planes_bd, _ = mod.apply(
                variables, jnp.asarray(cur), jnp.asarray(src),
                jnp.asarray(extr), jnp.asarray(poses), jnp.asarray(Ks),
                jnp.asarray(invK))

            if ref is None:
                mlp_params = []
                p = variables["params"]["mlp"]
                for name in sorted(p.keys()):
                    mlp_params.append(
                        (torch.from_numpy(np.asarray(p[name]["kernel"]).T),
                         torch.from_numpy(np.asarray(p[name]["bias"]))))
                ref = _torch_reference_volume(
                    torch.from_numpy(cur).permute(0, 3, 1, 2),
                    torch.from_numpy(src).permute(0, 1, 4, 2, 3),
                    torch.from_numpy(extr), torch.from_numpy(poses),
                    torch.from_numpy(Ks), torch.from_numpy(invK),
                    torch.from_numpy(np.asarray(planes_bd)),
                    mlp_params).numpy()

            ours = np.asarray(vol_bhwd).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4,
                                       err_msg=backend)
