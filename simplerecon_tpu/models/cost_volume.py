"""Cost / feature volume modules (Flax).

Two reducers over the plane-sweep warp, mirroring the reference's
`CostVolumeManager` (dot-product, `modules/cost_volume.py:13-380`) and
`FeatureVolumeManager` (metadata MLP — the "hero" component,
`modules/cost_volume.py:383-746`):

  * `DotProductCostVolume` — sum over views of (warped src . ref) feature
    dot products, masked by source-depth validity.
  * `MLPFeatureVolume` — per (pixel, plane), an MLP reduces the warped
    visual features plus geometric metadata (validity mask, projected
    depths, plane depth, dot products, ray angles, rays, pose-distance
    penalties) to a matching score.

TPU design notes: all planes are swept in one batched gather (the
reference's "fast" path) but chunked over planes inside the module with
optional rematerialization, so the (b, k, d, N, c) warp stack and the
(b, d, N, 202) MLP input never live in HBM at full size — the reference's
fast path pays 5.7 GB for exactly that materialization. The MLP's matmuls
run on the MXU in the compute dtype; all projection geometry stays fp32.

The metadata channel ORDER matches `modules/cost_volume.py:709-723`
exactly so converted reference weights remain valid:
  [src feats (k*c, view-major) | ref feats (c)] mask(k) depths(k) plane(1)
  dot(k) ray_angle(k) [ref ray (3) | src rays (k*3)] penalty(k) R(k) t(k)
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simplerecon_tpu.models.layers import MLP
from simplerecon_tpu.ops import cost_volume as cv_ops
from simplerecon_tpu.ops import geometry as geo


def mlp_input_channels(matching_dim_size: int, num_source_views: int) -> int:
    """Input width of the metadata MLP (`modules/cost_volume.py:419-435`).
    16 ch x 8 views + metadata = 202 for the hero config."""
    k = num_source_views
    return (matching_dim_size * (1 + k)  # visual
            + (1 + k)                    # projected depths + plane depth
            + 3 * (1 + k)                # rays
            + k                          # ray angles
            + k                          # masks
            + k                          # dot products
            + 3 * k)                     # pose penalty, R, t


class DotProductCostVolume(nn.Module):
    """Masked dot-product reduction summed over source views
    (`modules/cost_volume.py:237-335`).

    `backend="pallas"` runs the banded fused Pallas kernel in dot mode
    (inference only — warp + dots never leave VMEM); anything else uses
    the differentiable XLA matmul warp.
    """
    num_depth_bins: int = 64
    min_depth: float = 0.25
    max_depth: float = 5.0
    backend: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cur_feats_bhwc, src_feats_bkhwc, src_extrinsics_bk44,
                 src_poses_bk44, src_Ks_bk44, cur_invK_b44,
                 return_mask: bool = False):
        b, h, w, c = cur_feats_bhwc.shape
        planes_bd = cv_ops.generate_depth_planes(
            b, self.num_depth_bins, self.min_depth, self.max_depth)
        cur_bNc = cur_feats_bhwc.reshape(b, h * w, c)

        use_pallas = (self.backend in ("pallas", "pallas_interpret")
                      and not self.is_initializing())
        if use_pallas:
            from simplerecon_tpu.ops import pallas_cv
            volume_bdN = pallas_cv.banded_warp_dot_volume(
                src_feats_bkhwc.astype(self.dtype), cur_bNc,
                src_extrinsics_bk44, src_Ks_bk44, cur_invK_b44,
                planes_bd, compute_dtype=self.dtype,
                interpret=self.backend == "pallas_interpret")
            warp = None
        else:
            warp = cv_ops.sweep_warp(src_feats_bkhwc, src_extrinsics_bk44,
                                     src_Ks_bk44, cur_invK_b44, planes_bd)
            dot_bkdN = jnp.einsum("bkdnc,bnc->bkdn", warp.sampled_bkdNc,
                                  cur_bNc)
            volume_bdN = jnp.sum(dot_bkdN * warp.mask_bkdN, axis=1)
        volume_bhwd = volume_bdN.transpose(0, 2, 1).reshape(
            b, h, w, self.num_depth_bins)

        lowest = cv_ops.lowest_cost_depth(
            jax.lax.stop_gradient(volume_bhwd), planes_bd)
        overall = None
        if return_mask:
            if warp is None:
                # kernel path: the source-visibility mask only needs the
                # farthest plane and one feature channel — a cheap XLA
                # warp, same trick as MLPFeatureVolume below
                warp_last = cv_ops.sweep_warp(
                    src_feats_bkhwc[..., :1], src_extrinsics_bk44,
                    src_Ks_bk44, cur_invK_b44, planes_bd[:, -1:])
                overall = cv_ops.overall_source_mask(
                    warp_last, h, w).reshape(b, h, w)
            else:
                overall = cv_ops.overall_source_mask(
                    warp, h, w).reshape(b, h, w)
        return volume_bhwd, lowest, planes_bd, overall


def _metadata_chunk(mlp: MLP, planes_bdc, cur_bNc, src_feats_bkhwc,
                    src_extrinsics, src_Ks, cur_invK, src_cam_loc_bk3,
                    pose_penalty_bk3, compute_dtype):
    """Warp + metadata assembly + MLP for one chunk of depth planes.

    Returns (b, d_chunk, N) scores. Wrapped in nn.remat by the caller so
    the warp stack is recomputed, not stored, in the backward pass.
    """
    b, k = src_feats_bkhwc.shape[:2]
    c = src_feats_bkhwc.shape[-1]
    warp = cv_ops.sweep_warp(src_feats_bkhwc, src_extrinsics, src_Ks,
                             cur_invK, planes_bdc)
    dc = planes_bdc.shape[1]
    n = cur_bNc.shape[1]

    # visual features: warped src (view-major) then ref
    sampled_bdNkc = warp.sampled_bkdNc.transpose(0, 2, 3, 1, 4)
    visual = jnp.concatenate(
        [sampled_bdNkc.reshape(b, dc, n, k * c),
         jnp.broadcast_to(cur_bNc[:, None], (b, dc, n, c))], axis=-1)

    mask_bdNk = warp.mask_bkdN.transpose(0, 2, 3, 1)
    depths_bdNk = warp.depths_bkdN.transpose(0, 2, 3, 1)
    plane_bdN1 = jnp.broadcast_to(planes_bdc[:, :, None, None], (b, dc, n, 1))

    dot_bkdN = jnp.einsum("bkdnc,bnc->bkdn", warp.sampled_bkdNc, cur_bNc)
    dot_bdNk = (dot_bkdN * warp.mask_bkdN).transpose(0, 2, 3, 1)

    # rays: from the reference camera (at origin of the sweep frame) and
    # from each source camera center to the plane points (fp32)
    cur_rays_bdN3 = geo.normalize(warp.world_points_bdN3, axis=-1)
    src_rays_bkdN3 = geo.normalize(
        warp.world_points_bdN3[:, None] -
        src_cam_loc_bk3[:, :, None, None, :], axis=-1)
    ray_angle_bdNk = geo.cosine_similarity(
        cur_rays_bdN3[:, None], src_rays_bkdN3, axis=-1, eps=1e-5
    ).transpose(0, 2, 3, 1)
    all_rays = jnp.concatenate(
        [cur_rays_bdN3,
         src_rays_bkdN3.transpose(0, 2, 3, 1, 4).reshape(b, dc, n, k * 3)],
        axis=-1)

    pose_meta = jnp.broadcast_to(
        pose_penalty_bk3.transpose(0, 2, 1).reshape(b, 1, 1, 3 * k),
        (b, dc, n, 3 * k))  # [penalty(k), R(k), t(k)]

    feats = jnp.concatenate(
        [visual,
         mask_bdNk.astype(jnp.float32),
         depths_bdNk,
         plane_bdN1,
         dot_bdNk.astype(jnp.float32),
         ray_angle_bdNk,
         all_rays,
         pose_meta], axis=-1).astype(compute_dtype)

    return mlp(feats)[..., 0].astype(jnp.float32)  # (b, dc, N)


class MLPFeatureVolume(nn.Module):
    """Metadata-MLP feature volume (`modules/cost_volume.py:383-746`).

    `backend="xla_fused"` fuses metadata+MLP into the banded warp scan
    (the differentiable training path); `backend="pallas"` runs the
    banded fused Pallas kernel (`ops/pallas_cv.py`) — the inference
    analogue of the reference's `--fast_cost_volume`
    (`test.py:196-198`), but ~2x faster than the XLA scan and with
    neither the warp stack, the 202-ch metadata stack, nor the MLP
    intermediates ever touching HBM.
    """
    num_depth_bins: int = 64
    min_depth: float = 0.25
    max_depth: float = 5.0
    matching_dim_size: int = 16
    num_source_views: int = 7
    mlp_hidden: Tuple[int, ...] = (128, 128)
    plane_chunk: int = 8
    remat: bool = True
    # "xla" (chunked+remat assembly) | "xla_fused" (metadata+MLP fused
    # into the banded warp scan — no warp/metadata stack in HBM) |
    # "pallas" (y-banded fused kernel) | "pallas_full" (round-2
    # full-width fused kernel) | "pallas_v1" (two-step XLA warp +
    # metadata/MLP kernel); *_interpret variants run the kernel in the
    # Pallas interpreter (CPU tests)
    backend: str = "xla"
    # banded-axis choice for the matmul sweep (see
    # `ops/cost_volume.py::_band_axis_config`)
    band_axis: str = "x"
    # hand-written VJP for the fused sweep (xla_fused only): backward
    # recomputes each scan step once and propagates cotangents only to
    # features + MLP weights — geometry is data (poses are never
    # trained, as in the reference). See `ops/cost_volume.py::
    # _cvjp_builder`. "pallas" additionally computes the primal with
    # the banded Pallas kernel (fwd+bwd 33.9 ms vs 42.5 autodiff at
    # b1); False = checkpointed autodiff (GSPMD-partitionable).
    custom_vjp: object = False
    pallas_tile: int = 1024
    # 1-D f32 outputs need 1024-element tiles (Mosaic/XLA layout)
    pallas_warp_tile: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        in_ch = mlp_input_channels(self.matching_dim_size,
                                   self.num_source_views)
        del in_ch  # implied by the first Dense's input
        self.mlp = MLP(channel_list=list(self.mlp_hidden) + [1],
                       disable_final_activation=True, dtype=self.dtype,
                       name="mlp")

    def __call__(self, cur_feats_bhwc, src_feats_bkhwc, src_extrinsics_bk44,
                 src_poses_bk44, src_Ks_bk44, cur_invK_b44,
                 return_mask: bool = False):
        b, h, w, c = cur_feats_bhwc.shape
        k = src_feats_bkhwc.shape[1]
        n = h * w
        d = self.num_depth_bins

        planes_bd = cv_ops.generate_depth_planes(
            b, d, self.min_depth, self.max_depth)
        cur_bNc = cur_feats_bhwc.reshape(b, n, c)

        # pose metadata: DVMVS distance of each source pose w.r.t. the
        # reference (`modules/cost_volume.py:516-542`), fp32.
        poses = src_poses_bk44.astype(jnp.float32)
        penalty, r_meas, t_meas = geo.pose_distance(poses)
        pose_penalty_bk3 = jnp.stack([penalty, r_meas, t_meas], axis=-1)
        src_cam_loc_bk3 = poses[..., :3, 3]

        if self.backend == "xla_fused" and not self.is_initializing():
            # metadata+MLP fused into the banded warp scan: neither the
            # warp stack nor the 202-ch MLP input ever exists in HBM
            p = self.mlp.variables["params"]
            volume_bdN = cv_ops.sweep_mlp_volume(
                src_feats_bkhwc.astype(self.dtype), cur_bNc,
                src_extrinsics_bk44, src_Ks_bk44, cur_invK_b44,
                planes_bd, pose_penalty_bk3, src_cam_loc_bk3,
                ((p["dense0"]["kernel"], p["dense0"]["bias"]),
                 (p["dense1"]["kernel"], p["dense1"]["bias"]),
                 (p["dense2"]["kernel"], p["dense2"]["bias"])),
                compute_dtype=self.dtype, band_axis=self.band_axis,
                custom_vjp=self.custom_vjp)
        elif self.backend.startswith("pallas") and not self.is_initializing():
            volume_bdN = self._pallas_volume(
                planes_bd, cur_bNc, src_feats_bkhwc, src_extrinsics_bk44,
                src_Ks_bk44, cur_invK_b44, src_cam_loc_bk3,
                pose_penalty_bk3)
        else:
            chunk_fn = _metadata_chunk
            if self.remat:
                chunk_fn = nn.remat(_metadata_chunk,
                                    static_argnums=(9,))

            chunks = []
            step = min(self.plane_chunk, d)
            for s in range(0, d, step):
                chunks.append(chunk_fn(
                    self.mlp, planes_bd[:, s:s + step], cur_bNc,
                    src_feats_bkhwc, src_extrinsics_bk44, src_Ks_bk44,
                    cur_invK_b44, src_cam_loc_bk3, pose_penalty_bk3,
                    self.dtype))
            volume_bdN = jnp.concatenate(chunks, axis=1)
        volume_bhwd = volume_bdN.transpose(0, 2, 1).reshape(b, h, w, d)

        lowest = cv_ops.lowest_cost_depth(
            jax.lax.stop_gradient(volume_bhwd), planes_bd)

        overall = None
        if return_mask:
            # only the farthest plane matters for the source-visibility mask
            warp_last = cv_ops.sweep_warp(
                src_feats_bkhwc[..., :1], src_extrinsics_bk44, src_Ks_bk44,
                cur_invK_b44, planes_bd[:, -1:])
            overall = cv_ops.overall_source_mask(
                warp_last, h, w).reshape(b, h, w)
        return volume_bhwd, lowest, planes_bd, overall

    def _pallas_volume(self, planes_bd, cur_bNc, src_feats_bkhwc,
                       src_extrinsics_bk44, src_Ks_bk44, cur_invK_b44,
                       src_cam_loc_bk3, pose_penalty_bk3):
        """Fused-kernel path.

        Default ("pallas"): the y-banded fused warp+metadata+MLP kernel
        (`pallas_cv.banded_warp_feature_volume`) — narrow source bands
        sliced from VMEM-resident feature maps, two-hot MXU taps,
        metadata + MLP all channel-major in one Pallas program; no warp
        stack, no scan overhead. "pallas_full" keeps the round-2
        full-width fused kernel; "pallas_v1" the two-step variant (XLA
        warp sweep, then the metadata+MLP kernel)."""
        from simplerecon_tpu.ops import pallas_cv

        b, k = src_feats_bkhwc.shape[:2]
        c = src_feats_bkhwc.shape[-1]
        d = planes_bd.shape[1]
        n = cur_bNc.shape[1]

        if self.backend in ("pallas", "pallas_interpret"):
            p = self.mlp.variables["params"]
            vol = pallas_cv.banded_warp_feature_volume(
                src_feats_bkhwc.astype(self.dtype), cur_bNc,
                src_extrinsics_bk44, src_Ks_bk44, cur_invK_b44,
                planes_bd, pose_penalty_bk3, src_cam_loc_bk3,
                p["dense0"]["kernel"].astype(self.dtype),
                p["dense0"]["bias"],
                p["dense1"]["kernel"].astype(self.dtype),
                p["dense1"]["bias"],
                p["dense2"]["kernel"].astype(self.dtype),
                p["dense2"]["bias"],
                interpret=self.backend == "pallas_interpret")
            return vol.reshape(b, d, n)

        if self.backend in ("pallas_full", "pallas_full_interpret"):
            h_img, w_img = src_feats_bkhwc.shape[2:4]
            dtype = self.dtype
            # (b, k, h, c*w): c-major rows for the in-kernel lane-group
            # x-reduction
            img = src_feats_bkhwc.transpose(0, 1, 2, 4, 3).reshape(
                b, k, h_img, c * w_img).astype(dtype)
            proj = (src_Ks_bk44.astype(jnp.float32)
                    @ src_extrinsics_bk44.astype(jnp.float32))
            grid_N3 = geo.pixel_grid(h_img, w_img)
            rays_bN3 = jnp.einsum(
                "nj,bij->bni", grid_N3,
                cur_invK_b44[:, :3, :3].astype(jnp.float32))
            tile = min(self.pallas_warp_tile, n)
            while n % tile != 0:
                tile -= 1
            p = self.mlp.variables["params"]
            vol = pallas_cv.fused_warp_feature_volume(
                img, cur_bNc.astype(dtype), rays_bN3, planes_bd, proj,
                pose_penalty_bk3, src_cam_loc_bk3,
                p["dense0"]["kernel"].astype(dtype), p["dense0"]["bias"],
                p["dense1"]["kernel"].astype(dtype), p["dense1"]["bias"],
                p["dense2"]["kernel"].astype(dtype), p["dense2"]["bias"],
                tile=tile,
                interpret=self.backend == "pallas_full_interpret")
            return vol.reshape(b, d, n)

        # chunk planes so the materialized warp stack stays under ~1 GB
        # (at batch 32 the full hero stack is 45 GB and OOMs the chip)
        bytes_per_plane = b * k * n * c * 2  # bf16
        dc = max(1, min(d, int((1 << 30) // max(bytes_per_plane, 1))))
        while d % dc != 0:
            dc -= 1
        if dc < d:
            chunks = [self._pallas_volume(
                planes_bd[:, s:s + dc], cur_bNc, src_feats_bkhwc,
                src_extrinsics_bk44, src_Ks_bk44, cur_invK_b44,
                src_cam_loc_bk3, pose_penalty_bk3)
                for s in range(0, d, dc)]
            return jnp.concatenate(chunks, axis=1)

        warp = cv_ops.sweep_warp(src_feats_bkhwc, src_extrinsics_bk44,
                                 src_Ks_bk44, cur_invK_b44, planes_bd)
        # (b, k, d, N, c) -> (k, b*d*N, c); rows ordered (b, d, N)
        sampled_kRc = warp.sampled_bkdNc.transpose(1, 0, 2, 3, 4
                                                   ).reshape(k, b * d * n, c)
        mask_kR = warp.mask_bkdN.transpose(1, 0, 2, 3).reshape(k, -1)
        depths_kR = warp.depths_bkdN.transpose(1, 0, 2, 3).reshape(k, -1)

        h_img = src_feats_bkhwc.shape[2]
        w_img = src_feats_bkhwc.shape[3]
        grid_N3 = geo.pixel_grid(h_img, w_img)
        # unnormalized rays: the kernel derives world points (ray * z)
        # and unit rays from these
        rays_bN3 = jnp.einsum(
            "nj,bij->bni", grid_N3,
            cur_invK_b44[:, :3, :3].astype(jnp.float32))

        # largest divisor of N not exceeding the configured tile size
        tile = min(self.pallas_tile, n)
        while n % tile != 0:
            tile -= 1

        p = self.mlp.variables["params"]
        dtype = self.dtype
        vol = pallas_cv.fused_feature_volume(
            sampled_kRc.astype(dtype), mask_kR, depths_kR,
            cur_bNc.astype(dtype), rays_bN3, planes_bd,
            pose_penalty_bk3, src_cam_loc_bk3,
            p["dense0"]["kernel"].astype(dtype), p["dense0"]["bias"],
            p["dense1"]["kernel"].astype(dtype), p["dense1"]["bias"],
            p["dense2"]["kernel"].astype(dtype), p["dense2"]["bias"],
            tile=tile,
            interpret=self.backend == "pallas_v1_interpret")
        return vol.reshape(b, d, n)


def make_cost_volume(feature_volume_type: str, **kwargs):
    """Factory mirroring the reference's type switch
    (`experiment_modules/depth_model.py:160-176`)."""
    if feature_volume_type == "simple_cost_volume":
        keys = ("num_depth_bins", "min_depth", "max_depth", "backend",
                "dtype")
        return DotProductCostVolume(
            **{k: v for k, v in kwargs.items() if k in keys})
    if feature_volume_type == "mlp_feature_volume":
        return MLPFeatureVolume(**kwargs)
    raise ValueError(f"unknown feature_volume_type {feature_volume_type!r}")
