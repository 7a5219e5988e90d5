"""Pallas TPU kernels: fused warp + metadata-MLP for the feature volume.

Three generations live here; `banded_warp_feature_volume` (backend
"pallas") is the production inference path — 3.6 ms for the full hero
sweep (~51% MFU) vs 13.9 ms for the XLA banded scan, 11.4 ms b1 /
10.7 ms-per-frame b8 full-model — and doubles as the custom-VJP primal
for training. `fused_feature_volume` ("pallas_v1") and
`fused_warp_feature_volume` ("pallas_full") are earlier full-width
formulations kept as parity references.

The hero cost volume's hot loop (`modules/cost_volume.py:967-1164` in the
reference "fast" path) materializes, per (pixel, plane):

  * the 202-channel metadata vector  (b*d*N, 202)  in HBM,
  * two (b*d*N, 128) MLP intermediates in HBM.

At the hero config (N = 48*64 = 3072 px, d = 64 planes) that's ~400 MB of
HBM traffic per forward — the reason the reference's fast path costs
5.7 GB of GPU memory. This kernel fuses the whole reduction: for each
tile of pixels x one (batch, plane) cell it

  1. reads the warped source features (the only large input, read once),
  2. assembles the metadata vector in VMEM — dot products, normalized
     rays, ray angles, pose penalties are *computed in-kernel* from tiny
     per-(batch,plane) scalars, never touching HBM,
  3. chains the three Dense layers on the MXU with fp32 accumulation and
     LeakyReLU(0.01) between, all activations resident in VMEM,
  4. writes the (tile,) scalar scores.

HBM traffic drops to: sampled features (k*R*c, unavoidable) + masks/
depths (k*R) + output (R), ~8x less than the XLA path's materialized
intermediates.

Metadata channel ORDER matches `modules/cost_volume.py:709-723` exactly
(same as `models/cost_volume.py:_metadata_chunk`), so the same MLP
weights drive both paths:

  [src feats (k*c, view-major) | ref feats (c)] mask(k) depths(k)
  plane(1) dot(k) ray_angle(k) [ref ray (3) | src rays (k*3)]
  penalty(k) R(k) t(k)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def mlp_in_channels(k: int, c: int) -> int:
    return c * (1 + k) + (1 + k) + 3 * (1 + k) + k + k + k + 3 * k


def _metadata_mlp(cur, rays0, plane, sampled_list, mask_list, depth_list,
                  pose_meta_ref, src_loc_ref,
                  w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  tile: int, k: int):
    """Shared tail: metadata assembly + 3-layer MLP, all in VMEM.

    cur (T, c) f32, rays0 (T, 3) f32 unnormalized, plane scalar,
    sampled/mask/depth lists of per-view (T, c)/(T,)/(T,) f32.
    Returns (T,) f32 scores.
    """
    f32 = jnp.float32
    world = rays0 * plane
    inv_n0 = jax.lax.rsqrt(jnp.sum(rays0 * rays0, axis=-1) + 1e-30)
    rays = rays0 * inv_n0[:, None]

    dots = [jnp.sum(s * cur, axis=-1) * m
            for s, m in zip(sampled_list, mask_list)]
    visual = jnp.concatenate(sampled_list + [cur], axis=-1)

    mask_t = jnp.stack(mask_list, axis=-1)                  # (T, k)
    depths_t = jnp.stack(depth_list, axis=-1)               # (T, k)
    plane_col = jnp.full((tile, 1), plane, f32)
    dot_t = jnp.stack(dots, axis=-1)

    src_ray_parts = []
    angles = []
    for view in range(k):
        loc = src_loc_ref[0, view]                          # (3,)
        v = world - loc[None, :]
        inv_n = jax.lax.rsqrt(jnp.sum(v * v, axis=-1) + 1e-30)
        sr = v * inv_n[:, None]
        src_ray_parts.append(sr)
        angles.append(jnp.sum(rays * sr, axis=-1))
    angle_t = jnp.stack(angles, axis=-1)
    all_rays = jnp.concatenate([rays] + src_ray_parts, axis=-1)

    pose_cols = [jnp.broadcast_to(pose_meta_ref[0, :, j][None, :],
                                  (tile, k)) for j in range(3)]

    x = jnp.concatenate(
        [visual, mask_t, depths_t, plane_col, dot_t, angle_t, all_rays]
        + pose_cols, axis=-1)

    dtype = w0_ref.dtype
    h0 = jnp.dot(x.astype(dtype), w0_ref[...],
                 preferred_element_type=f32) + b0_ref[...].astype(f32)
    h0 = jax.nn.leaky_relu(h0, negative_slope=0.01)
    h1 = jnp.dot(h0.astype(dtype), w1_ref[...],
                 preferred_element_type=f32) + b1_ref[...].astype(f32)
    h1 = jax.nn.leaky_relu(h1, negative_slope=0.01)
    out = jnp.dot(h1.astype(dtype), w2_ref[...],
                  preferred_element_type=f32) + b2_ref[...].astype(f32)
    return out[:, 0]


def _kernel(planes_ref, pose_meta_ref, src_loc_ref,            # SMEM-ish
            sampled_ref, mask_ref, depths_ref, cur_ref, rays_ref,
            w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, k: int, c: int, d: int, tile: int):
    """One (batch*plane, pixel-tile) grid cell.

    Ref shapes:
      planes_ref    (b, d) in SMEM    full array; indexed by program_id
      pose_meta_ref (1, k, 3)         [penalty, R, t] per view
      src_loc_ref   (1, k, 3)         source camera centers (sweep frame)
      sampled_ref   (k, tile, c)      warped source features
      mask_ref      (k, tile)         depth-validity masks
      depths_ref    (k, tile)         projected depths
      cur_ref       (1, tile, c)      reference features
      rays_ref      (1, tile, 3)      unnormalized rays per ref pixel
      w*/b*         MLP params (full, VMEM)
      out_ref       (tile,)           scores (1-D row block)
    """
    f32 = jnp.float32
    bd = pl.program_id(0)
    plane = planes_ref[bd // d, bd % d]            # scalar from SMEM
    cur = cur_ref[0].astype(f32)                   # (T, c)
    rays0 = rays_ref[0].astype(f32)                # (T, 3) invK @ pix
                                                   # (UNNORMALIZED, z = 1)
    sampled_list = [sampled_ref[view].astype(f32) for view in range(k)]
    mask_list = [mask_ref[view].astype(f32) for view in range(k)]
    depth_list = [depths_ref[view].astype(f32) for view in range(k)]

    out_ref[...] = _metadata_mlp(
        cur, rays0, plane, sampled_list, mask_list, depth_list,
        pose_meta_ref, src_loc_ref, w0_ref, b0_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, tile=tile, k=k)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_feature_volume(sampled_kRc: jnp.ndarray,
                         mask_kR: jnp.ndarray,
                         depths_kR: jnp.ndarray,
                         cur_bNc: jnp.ndarray,
                         rays_bN3: jnp.ndarray,
                         planes_bd: jnp.ndarray,
                         pose_meta_bk3: jnp.ndarray,
                         src_loc_bk3: jnp.ndarray,
                         w0, b0, w1, b1, w2, b2,
                         tile: int = DEFAULT_TILE,
                         interpret: bool = False) -> jnp.ndarray:
    """Runs the fused reduction.

    Args:
      sampled_kRc: (k, b*d*N, c) warped source features, rows ordered
        (b, d, N) with N fastest.
      mask_kR, depths_kR: (k, b*d*N).
      cur_bNc: (b, N, c) reference features.
      rays_bN3: (b, N, 3) UNNORMALIZED rays invK @ (u+.5, v+.5, 1) per
        reference pixel (world point at plane z is ray * z).
      planes_bd: (b, d) plane depths.
      pose_meta_bk3: (b, k, 3) [penalty, R, t] per source view.
      src_loc_bk3: (b, k, 3) source camera centers in the sweep frame.
      w0 (C_in, 128), b0, w1 (128, 128), b1, w2 (128, 1), b2.

    Returns:
      (b, d, N) matching scores, fp32.
    """
    k, R, c = sampled_kRc.shape
    b, N, _ = cur_bNc.shape
    d = planes_bd.shape[1]
    assert R == b * d * N, (R, b, d, N)
    assert N % tile == 0, f"N={N} must divide tile={tile}"
    n_tiles = N // tile

    grid = (b * d, n_tiles)

    def row_block(bd, n):
        # block index into the flattened (b*d*N)/tile row axis
        return bd * n_tiles + n

    kernel = functools.partial(_kernel, k=k, c=c, d=d, tile=tile)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # planes
            pl.BlockSpec((1, k, 3), lambda bd, n, d=d: (bd // d, 0, 0),
                         memory_space=pltpu.VMEM),                 # pose
            pl.BlockSpec((1, k, 3), lambda bd, n, d=d: (bd // d, 0, 0),
                         memory_space=pltpu.VMEM),                 # src loc
            pl.BlockSpec((k, tile, c), lambda bd, n: (0, row_block(bd, n), 0),
                         memory_space=pltpu.VMEM),                 # sampled
            pl.BlockSpec((k, tile), lambda bd, n: (0, row_block(bd, n)),
                         memory_space=pltpu.VMEM),                 # mask
            pl.BlockSpec((k, tile), lambda bd, n: (0, row_block(bd, n)),
                         memory_space=pltpu.VMEM),                 # depths
            pl.BlockSpec((1, tile, c), lambda bd, n, d=d: (bd // d, n, 0),
                         memory_space=pltpu.VMEM),                 # cur
            pl.BlockSpec((1, tile, 3), lambda bd, n, d=d: (bd // d, n, 0),
                         memory_space=pltpu.VMEM),                 # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b2
        ],
        out_specs=pl.BlockSpec((tile,),
                               lambda bd, n: (row_block(bd, n),)),
        out_shape=jax.ShapeDtypeStruct((b * d * N,), jnp.float32),
        interpret=interpret,
        # the (k, tile, c) sampled block + f32 casts overflow the 16 MB
        # default scoped-VMEM cap at tile=1024; v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * (202 * 128 + 128 * 128 + 128),
            bytes_accessed=sampled_kRc.size * sampled_kRc.dtype.itemsize
            + 2 * k * R * 4 + R * 4,
            transcendentals=R * k),  # rsqrt per view
    )(planes_bd, pose_meta_bk3, src_loc_bk3, sampled_kRc, mask_kR,
      depths_kR, cur_bNc, rays_bN3, w0, b0, w1, b1, w2, b2)

    return out.reshape(b, d, N)


def _twohot_T(coord_t, size: int, tile: int):
    """Transposed tent two-hot: (size, T) bilinear tap weights for (T,)
    coords (same tap math as `ops.cost_volume._twohot`, channel-major)."""
    # int32 iota then convert: Mosaic's tpu.iota only produces integers
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, tile), 0)
    wgt = 1.0 - jnp.abs(coord_t[None, :] - iota.astype(jnp.float32))
    return jnp.maximum(wgt, 0.0)


def _banded_kernel(planes_ref, off_ref, pose_meta_ref, src_loc_ref,
                   img_ref, u_ref, v_ref, z_ref, cur_ref, rays_ref,
                   w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                   out_ref, *, k: int, c: int, d: int, S: int, w: int,
                   band: int, tile: int, mode: str = "mlp"):
    """One (batch, plane, tile) cell of the y-banded fused sweep.

    The TPU-shaped formulation of `ops.cost_volume.sweep_mlp_volume`'s
    scan step, hand-scheduled and fully CHANNEL-MAJOR (everything is
    (channels, T) with the T samples on lanes):

      * source features live VMEM-resident in (h*c, w) layout, so the
        y-band slice is a dynamic SUBLANE slice at offset off*c —
        16-aligned for any offset when c = 16, no offset quantization;
      * the x taps are one (band*c, w) x (w, T) MXU matmul per view
        (K = w = 128 at hero scale: an exact systolic pass);
      * the y taps are a per-sample reduce over the band (VPU);
      * metadata + the 3-layer MLP run transposed: (128, C_in) x
        (C_in, T) keeps T on lanes end to end.

    The batch is a leading GRID dimension, not a host loop: per-element
    band offsets are SMEM scalar reads, so batching costs nothing and
    cells from different elements pipeline back to back (the XLA scan
    path's `lax.map` serializes per element instead).

    Ref shapes: planes (b, d) SMEM; off (b, k, d*S) int32 SMEM;
    pose_meta / src_loc (1, k, 3); img (1, k, h*c, w); u/v/z
    (1, 1, k, T) — step-major so the block's LAST TWO dims are (k, T),
    satisfying Mosaic's (8, 128)-divisible-or-full rule; cur
    (1, 1, c, T); rays (1, 1, 3, T); w0t (128, C_in), w1t (128, 128),
    w2t (1, 128); out (1, 1, 1, T) over a (b, d*S, 1, T) array.
    """
    f32 = jnp.float32
    bi = pl.program_id(0)
    di = pl.program_id(1)
    si = pl.program_id(2)
    step = di * S + si
    plane = planes_ref[bi, di]
    wdtype = w0t_ref.dtype

    cur_T = cur_ref[0, 0].astype(f32)                  # (c, T)
    rays0_T = rays_ref[0, 0].astype(f32)               # (3, T)
    world_T = rays0_T * plane
    inv_n0 = jax.lax.rsqrt(jnp.sum(rays0_T * rays0_T, axis=0) + 1e-30)
    rays_n = rays0_T * inv_n0[None, :]

    sampled_list, mask_list, z_list, dot_list = [], [], [], []
    sr_list, angle_list = [], []
    for view in range(k):
        off_v = off_ref[bi, view, step]                # scalar (SMEM)
        u = u_ref[0, 0, view]                          # (T,)
        v = v_ref[0, 0, view]
        z = z_ref[0, 0, view].astype(f32)

        sl = img_ref[0, view, pl.dslice(off_v * c, band * c), :]
        ohu_T = _twohot_T(u, w, tile).astype(wdtype)   # (w, T)
        rows_T = jnp.dot(sl, ohu_T,
                         preferred_element_type=f32)   # (band*c, T)
        vo = v - off_v.astype(f32)
        ohv_T = _twohot_T(vo, band, tile)              # (band, T)
        sampled_T = jnp.sum(rows_T.reshape(band, c, tile)
                            * ohv_T[:, None, :], axis=0)  # (c, T)

        mask = (z > 0).astype(f32)
        sampled_list.append(sampled_T)
        mask_list.append(mask[None, :])
        z_list.append(z[None, :])
        dot_list.append((jnp.sum(sampled_T * cur_T, axis=0)
                         * mask)[None, :])
        if mode != "mlp":
            continue
        loc = src_loc_ref[0, view].astype(f32)         # (3,)
        v3 = world_T - loc[:, None]
        inv_n = jax.lax.rsqrt(jnp.sum(v3 * v3, axis=0) + 1e-30)
        sr = v3 * inv_n[None, :]
        sr_list.append(sr)
        angle_list.append(jnp.sum(rays_n * sr, axis=0)[None, :])

    if mode == "dot":
        # DotProductCostVolume reduction (`modules/cost_volume.py:
        # 237-335`): masked dots summed over source views. Taps of
        # off-image samples are identically zero (tent weights vanish),
        # so masking by z>0 alone matches the gather path's
        # in-bounds-AND-in-front mask.
        out_ref[0, 0, 0, :] = sum(dl[0] for dl in dot_list)
        return

    pose_rows = [jnp.full((1, tile), pose_meta_ref[0, view, j], f32)
                 for j in range(3) for view in range(k)]

    feats_T = jnp.concatenate(
        sampled_list + [cur_T] + mask_list + z_list
        + [jnp.full((1, tile), plane, f32)] + dot_list + angle_list
        + [rays_n] + sr_list + pose_rows, axis=0)      # (C_in, T)

    h0 = jnp.dot(w0t_ref[...], feats_T.astype(wdtype),
                 preferred_element_type=f32) + b0_ref[...][:, None]
    h0 = jax.nn.leaky_relu(h0, negative_slope=0.01)
    h1 = jnp.dot(w1t_ref[...], h0.astype(wdtype),
                 preferred_element_type=f32) + b1_ref[...][:, None]
    h1 = jax.nn.leaky_relu(h1, negative_slope=0.01)
    out = jnp.dot(w2t_ref[...], h1.astype(wdtype),
                  preferred_element_type=f32) + b2_ref[...][:, None]
    out_ref[0, 0, 0, :] = out[0]


def _banded_call(img_bkXw, u, v, z, cur_bSCT, rays_bS3T, planes_bd,
                 off_bkdS, pose_meta_bk3, src_loc_bk3,
                 w0t, b0, w1t, b1, w2t, b2,
                 *, b, k, c, d, S, w, band, tile, interpret,
                 mode: str = "mlp"):
    """pallas_call wrapper: full batch at one band tier, grid (b, d, S)."""
    kernel = functools.partial(_banded_kernel, k=k, c=c, d=d, S=S, w=w,
                               band=band, tile=tile, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(b, d, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),              # off
            pl.BlockSpec((1, k, 3), lambda bi, di, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # pose
            pl.BlockSpec((1, k, 3), lambda bi, di, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # src loc
            pl.BlockSpec((1, k, img_bkXw.shape[2], w),
                         lambda bi, di, si: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # img
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, di, si, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # u
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, di, si, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # v
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, di, si, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # z
            pl.BlockSpec((1, 1, c, tile),
                         lambda bi, di, si: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),              # cur
            pl.BlockSpec((1, 1, 3, tile),
                         lambda bi, di, si: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),              # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w0t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w2t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # b2
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, tile),
            lambda bi, di, si, S=S: (bi, di * S + si, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d * S, 1, tile), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * S * tile * k * (band * c + w * band * c // w
                                              + 202 + 128),
            bytes_accessed=img_bkXw.size * img_bkXw.dtype.itemsize
            + 3 * b * k * d * S * tile * 4 + b * d * S * tile * 4,
            transcendentals=b * d * S * tile * k),
    )(planes_bd, off_bkdS, pose_meta_bk3, src_loc_bk3, img_bkXw,
      u, v, z, cur_bSCT, rays_bS3T, w0t, b0, w1t, b1, w2t, b2)
    return out


def _banded_prep(src_feats_bkhwc, cur_bNc, src_Ks_bk44,
                 src_extrinsics_bk44, cur_invK_b44, depth_planes_bd,
                 dtype, tile_h: int, tile_w: int,
                 bands: Tuple[int, ...]):
    """XLA-side geometry/layout prep shared by the banded kernel's
    forward and backward: projections, tile-major coordinates, band
    tiers, channel-major operands. Returns a dict (see keys below)."""
    import math

    from simplerecon_tpu.ops import geometry as geo

    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    f32 = jnp.float32

    th = tile_h
    while h % th != 0:
        th -= 1
    tw = tile_w
    while w % tw != 0:
        tw -= 1
    S = (h // th) * (w // tw)
    tile = th * tw
    band_list = [v for v in bands if v < h]

    grid_N3 = geo.pixel_grid(h, w)
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3,
                          cur_invK_b44[:, :3, :3].astype(f32))
    world_bdN3 = rays_bN3[:, None] * depth_planes_bd[..., None, None]
    uvz = geo.project_points(
        world_bdN3[:, None],
        src_Ks_bk44[:, :, None].astype(f32),
        src_extrinsics_bk44[:, :, None].astype(f32))  # (b, k, d, N, 3)

    # (b, k, d, N) -> (b, k, d*S, T) in tile-major order
    def stripes(a_bkdN):
        a = a_bkdN.reshape(b, k, d, h // th, th, w // tw, tw)
        a = a.transpose(0, 1, 2, 3, 5, 4, 6)
        return a.reshape(b, k, d * S, tile)

    u = stripes(uvz[..., 0] - 0.5)
    v = stripes(uvz[..., 1] - 0.5)
    z = stripes(uvz[..., 2])

    # per-(view, plane, tile) y span and tier fits. Band offsets are
    # quantized so off*c lands on a sublane-tile boundary (granularity
    # 16 rows for bf16, 8 for f32): q = 1 whenever c is a multiple of
    # the granularity (the hero c = 16), else the band widens by q.
    gran = 16 if dtype == jnp.bfloat16 else 8
    q = gran // math.gcd(c, gran)
    band_list = [bv + (q if q > 1 else 0) for bv in band_list]
    band_list = [bv for bv in band_list if bv < h]

    v0 = jnp.floor(v)
    has_tap = (v > -1.0) & (v < h)
    lo = jnp.min(jnp.where(has_tap, jnp.clip(v0, 0, h - 1), h - 1),
                 axis=-1)
    hi = jnp.max(jnp.where(has_tap, jnp.clip(v0 + 1, 0, h - 1), 0),
                 axis=-1)
    # tier choice is BATCH-WIDE (one pallas_call serves the whole batch;
    # a single wide-motion element widens everyone's band — still exact)
    offs = []
    fits = []
    for bv in band_list:
        off_raw = jnp.clip(lo, 0, h - bv)
        off_q = (off_raw.astype(jnp.int32) // q) * q
        offs.append(off_q)
        fits.append(jnp.all(hi - off_q <= bv - 1))
    zero_off = jnp.zeros_like(lo, dtype=jnp.int32)

    # channel-major operands
    def tile_pix(a_bNe):
        e = a_bNe.shape[-1]
        a = a_bNe.reshape(b, h // th, th, w // tw, tw, e)
        a = a.transpose(0, 1, 3, 2, 4, 5).reshape(b, S, tile, e)
        return a.transpose(0, 1, 3, 2)               # (b, S, e, T)

    # (y, c)-major rows over w columns: the y-band slice is a contiguous
    # sublane slice at off*c (16-aligned for any off when c = 16)
    img_bkXw = src_feats_bkhwc.transpose(0, 1, 2, 4, 3).reshape(
        b, k, h * c, w).astype(dtype)
    cur_bSCT = tile_pix(cur_bNc.astype(dtype))
    rays_bS3T = tile_pix(rays_bN3)

    # step-major coordinate layout: the pallas blocks' last two dims
    # must be (k, T) (Mosaic (8,128)-divisible-or-full rule)
    return dict(
        img_bkXw=img_bkXw, cur_bSCT=cur_bSCT, rays_bS3T=rays_bS3T,
        u_t=u.transpose(0, 2, 1, 3),                  # (b, d*S, k, T)
        v_t=v.transpose(0, 2, 1, 3),
        z_t=z.transpose(0, 2, 1, 3),
        offs=offs, fits=fits, zero_off=zero_off, band_list=band_list,
        th=th, tw=tw, S=S, tile=tile)


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "tile_w", "bands",
                                    "interpret", "mode"))
def banded_warp_feature_volume(src_feats_bkhwc: jnp.ndarray,
                               cur_bNc: jnp.ndarray,
                               src_extrinsics_bk44: jnp.ndarray,
                               src_Ks_bk44: jnp.ndarray,
                               cur_invK_b44: jnp.ndarray,
                               depth_planes_bd: jnp.ndarray,
                               pose_meta_bk3: jnp.ndarray,
                               src_loc_bk3: jnp.ndarray,
                               w0, b0, w1, b1, w2, b2,
                               tile_h: int = 4,
                               tile_w: int = 128,
                               bands: Tuple[int, ...] = (16, 32),
                               interpret: bool = False,
                               mode: str = "mlp") -> jnp.ndarray:
    """Y-banded fused warp+metadata+MLP — the Pallas analogue of
    `ops.cost_volume.sweep_mlp_volume` (band_axis="y" geometry).

    Geometry (projection, band spans, tier fits) is computed in XLA; the
    kernel consumes per-tile coordinates and band offsets and keeps
    the source maps VMEM-resident across the whole (plane, tile) grid
    — no scan carries, no per-step dynamic_slice HBM round-trips, no
    warp/metadata stack in HBM. Banding is tiered per batch element
    exactly like the XLA path: `lax.cond` picks the narrowest band that
    covers every tile's y-span, with an exact full-height fallback.

    Narrow tiles (default 4 x 128, measured fastest on v5e: 3.6 ms for
    the full hero sweep vs 4.8 at 8x64 and 11.5 at 8x128) keep the
    y-span — tile_h plus
    epipolar tilt across tile_w columns — inside the 16-row band for
    typical motion; the per-cell overhead that makes many small steps
    expensive in the XLA scan is ~zero here.

    Returns (b, d, N) fp32 matching scores.
    """
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    n = h * w
    f32 = jnp.float32
    dtype = w0.dtype

    p = _banded_prep(src_feats_bkhwc, cur_bNc, src_Ks_bk44,
                     src_extrinsics_bk44, cur_invK_b44, depth_planes_bd,
                     dtype, tile_h, tile_w, bands)
    th, tw, S, tile = p["th"], p["tw"], p["S"], p["tile"]

    w0t = jnp.transpose(w0).astype(dtype)
    w1t = jnp.transpose(w1).astype(dtype)
    w2t = jnp.transpose(w2).astype(dtype)
    b0f = b0.astype(f32)
    b1f = b1.astype(f32)
    b2f = b2.astype(f32)

    def run(band, off_bkdS):
        return _banded_call(
            p["img_bkXw"], p["u_t"], p["v_t"], p["z_t"], p["cur_bSCT"],
            p["rays_bS3T"], depth_planes_bd, off_bkdS,
            pose_meta_bk3.astype(f32), src_loc_bk3.astype(f32),
            w0t, b0f, w1t, b1f, w2t, b2f,
            b=b, k=k, c=c, d=d, S=S, w=w, band=band, tile=tile,
            interpret=interpret, mode=mode)

    def tiered(i):
        if i == len(p["band_list"]):
            return run(h, p["zero_off"])
        return jax.lax.cond(p["fits"][i],
                            lambda: run(p["band_list"][i], p["offs"][i]),
                            lambda: tiered(i + 1))

    out = tiered(0)                                   # (b, d*S, 1, T)
    out = out.reshape(b, d, h // th, w // tw, th, tw)
    return out.transpose(0, 1, 2, 4, 3, 5).reshape(b, d, n)


def _twohot_weights(coord, size: int, tile: int):
    """Two-hot bilinear tap matrix (T, size), zeros out of range.
    Same tap math as `ops.cost_volume._twohot` (grid_sample parity)."""
    f32 = jnp.float32
    c0 = jnp.floor(coord)
    w1 = coord - c0
    w0 = 1.0 - w1
    i0 = c0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = ((i0 >= 0) & (i0 < size)).astype(f32)
    v1 = ((i1 >= 0) & (i1 < size)).astype(f32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, size), 1)
    hit0 = (iota == jnp.clip(i0, 0, size - 1)[:, None]).astype(f32)
    hit1 = (iota == jnp.clip(i1, 0, size - 1)[:, None]).astype(f32)
    return hit0 * (w0 * v0)[:, None] + hit1 * (w1 * v1)[:, None]


def _warp_kernel(planes_ref, proj_ref, pose_meta_ref, src_loc_ref,
                 img_ref, cur_ref, rays_ref,
                 w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 out_ref, *, k: int, c: int, d: int, h: int, w: int,
                 tile: int, eps: float = 1e-8):
    """Fully fused cell: project -> two-hot MXU warp -> metadata -> MLP.

    The source feature maps live in VMEM in (h, c*w) layout (c-major
    within a row). Per view, bilinear sampling is one (T, h) x (h, c*w)
    matmul (y taps) followed by a lane-group reduce over w (x taps) —
    no gathers anywhere. Projection runs on the VPU from the (4, 4)
    K @ src_T_cur matrices in SMEM, mirroring `geo.project_points`'s
    safe divide exactly.
    """
    f32 = jnp.float32
    bd = pl.program_id(0)
    b_idx = bd // d
    plane = planes_ref[b_idx, bd % d]
    cur = cur_ref[0].astype(f32)                   # (T, c)
    rays0 = rays_ref[0].astype(f32)                # (T, 3) unnormalized
    world = rays0 * plane                          # (T, 3) sweep frame

    wdtype = w0_ref.dtype
    sampled_list = []
    mask_list = []
    depth_list = []
    for view in range(k):
        # P = K @ src_T_cur rows from SMEM (scalar reads)
        def p(i, j):
            return proj_ref[b_idx, view, i, j]

        cx = world[:, 0] * p(0, 0) + world[:, 1] * p(0, 1) \
            + world[:, 2] * p(0, 2) + p(0, 3)
        cy = world[:, 0] * p(1, 0) + world[:, 1] * p(1, 1) \
            + world[:, 2] * p(1, 2) + p(1, 3)
        cz = world[:, 0] * p(2, 0) + world[:, 1] * p(2, 1) \
            + world[:, 2] * p(2, 2) + p(2, 3)
        nonzero = jnp.abs(cz) > eps
        z_eps = cz + eps
        scale = jnp.where(nonzero, 1.0 / z_eps, 1.0)
        x = cx * scale - 0.5                       # index-space coords
        y = cy * scale - 0.5

        ohy = _twohot_weights(y, h, tile)                    # (T, h)
        rows = jnp.dot(ohy.astype(wdtype), img_ref[0, view],
                       preferred_element_type=f32)           # (T, c*w)
        ohx = _twohot_weights(x, w, tile)                    # (T, w)
        sampled = jnp.sum(rows.reshape(tile, c, w)
                          * ohx[:, None, :], axis=-1)        # (T, c)

        sampled_list.append(sampled)
        mask_list.append((z_eps > 0).astype(f32))
        depth_list.append(z_eps)

    out_ref[...] = _metadata_mlp(
        cur, rays0, plane, sampled_list, mask_list, depth_list,
        pose_meta_ref, src_loc_ref, w0_ref, b0_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, tile=tile, k=k)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_warp_feature_volume(img_bkhW: jnp.ndarray,
                              cur_bNc: jnp.ndarray,
                              rays_bN3: jnp.ndarray,
                              planes_bd: jnp.ndarray,
                              proj_bk44: jnp.ndarray,
                              pose_meta_bk3: jnp.ndarray,
                              src_loc_bk3: jnp.ndarray,
                              w0, b0, w1, b1, w2, b2,
                              tile: int = DEFAULT_TILE,
                              interpret: bool = False) -> jnp.ndarray:
    """Warp + metadata + MLP in ONE kernel — zero HBM intermediates.

    The v1 kernel consumed a pre-warped (k, b*d*N, c) stack built by an
    XLA gather (or matmul) sweep; this variant moves the warp itself
    onto the MXU inside the kernel, so the only HBM traffic is the tiny
    source maps, per-pixel rays/features, and the (b*d*N,) scores.

    Args:
      img_bkhW: (b, k, h, c*w) source features, c-major rows
        (transpose(feats, (h, c, w)).reshape(h, c*w)).
      cur_bNc: (b, N, c) reference features.
      rays_bN3: (b, N, 3) unnormalized rays invK @ (u+.5, v+.5, 1).
      planes_bd: (b, d) plane depths.
      proj_bk44: (b, k, 4, 4) fp32 K @ src_cam_T_cur_cam.
      pose_meta_bk3 / src_loc_bk3: (b, k, 3).
      w0 (C_in, 128), b0, w1 (128, 128), b1, w2 (128, 1), b2.

    Returns (b, d, N) fp32 matching scores.
    """
    b, k, h, W = img_bkhW.shape
    _, N, c = cur_bNc.shape
    w = W // c
    d = planes_bd.shape[1]
    assert N % tile == 0, f"N={N} must divide tile={tile}"
    n_tiles = N // tile
    grid = (b * d, n_tiles)

    kernel = functools.partial(_warp_kernel, k=k, c=c, d=d, h=h, w=w,
                               tile=tile)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # proj
            pl.BlockSpec((1, k, 3), lambda bd, n, d=d: (bd // d, 0, 0),
                         memory_space=pltpu.VMEM),                 # pose
            pl.BlockSpec((1, k, 3), lambda bd, n, d=d: (bd // d, 0, 0),
                         memory_space=pltpu.VMEM),                 # src loc
            pl.BlockSpec((1, k, h, W), lambda bd, n, d=d: (bd // d, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # img
            pl.BlockSpec((1, tile, c), lambda bd, n, d=d: (bd // d, n, 0),
                         memory_space=pltpu.VMEM),                 # cur
            pl.BlockSpec((1, tile, 3), lambda bd, n, d=d: (bd // d, n, 0),
                         memory_space=pltpu.VMEM),                 # rays
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # b2
        ],
        out_specs=pl.BlockSpec(
            (tile,), lambda bd, n, n_tiles=n_tiles: (bd * n_tiles + n,)),
        out_shape=jax.ShapeDtypeStruct((b * d * N,), jnp.float32),
        interpret=interpret,
        # the unrolled per-view (tile, c*w) row intermediates exceed the
        # default 16 MB scoped cap; v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * N * (k * h * (c * w) // 1
                                   + 202 * 128 + 128 * 128 + 128),
            bytes_accessed=img_bkhW.size * img_bkhW.dtype.itemsize * d
            + cur_bNc.size * 4 + b * d * N * 4,
            transcendentals=b * d * N * k),
    )(planes_bd, proj_bk44.astype(jnp.float32), pose_meta_bk3,
      src_loc_bk3, img_bkhW, cur_bNc, rays_bN3, w0, b0, w1, b1, w2, b2)

    return out.reshape(b, d, N)


def banded_warp_dot_volume(src_feats_bkhwc: jnp.ndarray,
                           cur_bNc: jnp.ndarray,
                           src_extrinsics_bk44: jnp.ndarray,
                           src_Ks_bk44: jnp.ndarray,
                           cur_invK_b44: jnp.ndarray,
                           depth_planes_bd: jnp.ndarray,
                           compute_dtype=jnp.bfloat16,
                           tile_h: int = 4,
                           tile_w: int = 128,
                           bands: Tuple[int, ...] = (16, 32),
                           interpret: bool = False) -> jnp.ndarray:
    """Dot-product cost volume via the banded kernel (mode="dot").

    The inference fast path for `DotProductCostVolume`
    (`modules/cost_volume.py:237-335` reduction: masked dot products
    summed over source views) — same banded two-hot warp as the MLP
    kernel, with the metadata/MLP stage replaced by the in-register
    masked-dot reduction. Returns (b, d, N) fp32.
    """
    b, k = src_feats_bkhwc.shape[:2]
    dummy_w = jnp.zeros((1, 1), compute_dtype)
    dummy_b = jnp.zeros((1,), jnp.float32)
    zeros3 = jnp.zeros((b, k, 3), jnp.float32)
    return banded_warp_feature_volume(
        src_feats_bkhwc, cur_bNc, src_extrinsics_bk44, src_Ks_bk44,
        cur_invK_b44, depth_planes_bd, zeros3, zeros3,
        dummy_w, dummy_b, dummy_w, dummy_b, dummy_w, dummy_b,
        tile_h=tile_h, tile_w=tile_w, bands=bands, interpret=interpret,
        mode="dot")


def _banded_bwd_kernel(planes_ref, off_ref, pose_meta_ref, src_loc_ref,
                       img_ref, u_ref, v_ref, z_ref, cur_ref, rays_ref,
                       g_ref, w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref,
                       w0d_ref, w1d_ref, w2d_ref,
                       d_img_ref, d_cur_ref, d_w0t_ref, d_b0_ref,
                       d_w1t_ref, d_b1_ref, d_w2t_ref, d_b2_ref,
                       *, k: int, c: int, d: int, S: int, w: int,
                       band: int, tile: int):
    """Backward of `_banded_kernel` (mode="mlp"), one grid cell.

    Recomputes the cell's forward in VMEM (taps, metadata, MLP
    pre-activations), then walks the cotangent back: MLP transposes,
    the dot-product split, and the warp transpose — the transpose of a
    two-hot contraction is a two-hot contraction, so d_img is one
    (band*c, T) x (T, w) MXU matmul per view accumulated into a dynamic
    sublane slice of the per-batch d_img block. Gradients flow ONLY to
    features and MLP weights (mask/z/plane/angle/ray/pose channels are
    geometry — reference training semantics, poses never receive
    gradients). Grid is (b, S, d) with d innermost so the revisited
    accumulator blocks (d_img, d_w* per batch element; d_cur per
    (batch, tile)) see contiguous visits.
    """
    f32 = jnp.float32
    bi = pl.program_id(0)
    si = pl.program_id(1)
    di = pl.program_id(2)
    step = di * S + si
    plane = planes_ref[bi, di]
    wdtype = w0t_ref.dtype
    first_of_b = (si == 0) & (di == 0)

    g_t = g_ref[0, 0, 0, :].astype(f32)                 # (T,)

    # ---- recompute the forward cell ----
    cur_T = cur_ref[0, 0].astype(f32)                   # (c, T)
    rays0_T = rays_ref[0, 0].astype(f32)                # (3, T)
    world_T = rays0_T * plane
    inv_n0 = jax.lax.rsqrt(jnp.sum(rays0_T * rays0_T, axis=0) + 1e-30)
    rays_n = rays0_T * inv_n0[None, :]

    sampled_list, mask_list, z_list, dot_list = [], [], [], []
    sr_list, angle_list = [], []
    ohu_list, ohv_list, off_list = [], [], []
    for view in range(k):
        off_v = off_ref[bi, view, step]
        u = u_ref[0, 0, view]
        v = v_ref[0, 0, view]
        z = z_ref[0, 0, view].astype(f32)

        sl = img_ref[0, view, pl.dslice(off_v * c, band * c), :]
        ohu_T = _twohot_T(u, w, tile).astype(wdtype)    # (w, T)
        rows_T = jnp.dot(sl, ohu_T,
                         preferred_element_type=f32)    # (band*c, T)
        vo = v - off_v.astype(f32)
        ohv_T = _twohot_T(vo, band, tile)               # (band, T)
        sampled_T = jnp.sum(rows_T.reshape(band, c, tile)
                            * ohv_T[:, None, :], axis=0)  # (c, T)

        mask = (z > 0).astype(f32)
        loc = src_loc_ref[0, view].astype(f32)
        v3 = world_T - loc[:, None]
        inv_n = jax.lax.rsqrt(jnp.sum(v3 * v3, axis=0) + 1e-30)
        sr = v3 * inv_n[None, :]

        sampled_list.append(sampled_T)
        mask_list.append(mask[None, :])
        z_list.append(z[None, :])
        dot_list.append((jnp.sum(sampled_T * cur_T, axis=0)
                         * mask)[None, :])
        sr_list.append(sr)
        angle_list.append(jnp.sum(rays_n * sr, axis=0)[None, :])
        ohu_list.append(ohu_T)
        ohv_list.append(ohv_T)
        off_list.append(off_v)

    pose_rows = [jnp.full((1, tile), pose_meta_ref[0, view, j], f32)
                 for j in range(3) for view in range(k)]
    feats_T = jnp.concatenate(
        sampled_list + [cur_T] + mask_list + z_list
        + [jnp.full((1, tile), plane, f32)] + dot_list + angle_list
        + [rays_n] + sr_list + pose_rows, axis=0)       # (C_in, T)
    feats_d = feats_T.astype(wdtype)

    h0pre = jnp.dot(w0t_ref[...], feats_d,
                    preferred_element_type=f32) + b0_ref[...][:, None]
    h0 = jax.nn.leaky_relu(h0pre, negative_slope=0.01)
    h0d = h0.astype(wdtype)
    h1pre = jnp.dot(w1t_ref[...], h0d,
                    preferred_element_type=f32) + b1_ref[...][:, None]
    h1 = jax.nn.leaky_relu(h1pre, negative_slope=0.01)

    # ---- MLP backward (all (128, T) channel-major) ----
    w2col = w2t_ref[...].astype(f32)[0]                 # (128,)
    d_h1 = w2col[:, None] * g_t[None, :]                # (128, T)
    d_w2t_c = jnp.sum(h1 * g_t[None, :], axis=1)        # (128,)
    d_b2_c = jnp.sum(g_t)
    d_h1p = d_h1 * jnp.where(h1pre > 0, 1.0, 0.01)
    d_h1pd = d_h1p.astype(wdtype)
    d_h0 = jnp.dot(w1d_ref[...], d_h1pd,
                   preferred_element_type=f32)          # (128, T)
    d_w1t_c = jax.lax.dot_general(
        d_h1pd, h0d, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)                     # (out, in)
    d_b1_c = jnp.sum(d_h1p, axis=1)
    d_h0p = d_h0 * jnp.where(h0pre > 0, 1.0, 0.01)
    d_h0pd = d_h0p.astype(wdtype)
    d_feats = jnp.dot(w0d_ref[...], d_h0pd,
                      preferred_element_type=f32)       # (C_in, T)
    d_w0t_c = jax.lax.dot_general(
        d_h0pd, feats_d, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)                     # (128, C_in)
    d_b0_c = jnp.sum(d_h0p, axis=1)

    # ---- split d_feats: only feature channels carry gradient ----
    d_cur_c = d_feats[k * c:k * c + c]                  # (c, T)
    o_dot = k * c + c + 2 * k + 1
    for view in range(k):
        d_dot = (d_feats[o_dot + view]
                 * mask_list[view][0])                  # (T,)
        d_samp = (d_feats[view * c:(view + 1) * c]
                  + d_dot[None, :] * cur_T)             # (c, T)
        d_cur_c = d_cur_c + d_dot[None, :] * sampled_list[view]

        # warp transpose: d_sl = (ohv x d_samp) @ ohu^T
        d_rows = (ohv_list[view][:, None, :]
                  * d_samp[None, :, :]).reshape(band * c, tile)
        d_sl = jax.lax.dot_general(
            d_rows.astype(wdtype), ohu_list[view],
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                 # (band*c, w)
        off_v = off_list[view]

        @pl.when(first_of_b)
        def _init_view(view=view):
            d_img_ref[0, view] = jnp.zeros_like(d_img_ref[0, view])

        d_img_ref[0, view, pl.dslice(off_v * c, band * c), :] = (
            d_img_ref[0, view, pl.dslice(off_v * c, band * c), :]
            + d_sl)

    @pl.when(di == 0)
    def _():
        d_cur_ref[0, 0] = d_cur_c

    @pl.when(di != 0)
    def _():
        d_cur_ref[0, 0] = d_cur_ref[0, 0] + d_cur_c

    @pl.when(first_of_b)
    def _():
        d_w0t_ref[0] = d_w0t_c
        d_b0_ref[0, 0] = d_b0_c
        d_w1t_ref[0] = d_w1t_c
        d_b1_ref[0, 0] = d_b1_c
        d_w2t_ref[0, 0] = d_w2t_c
        d_b2_ref[0, 0] = jnp.full((128,), d_b2_c, jnp.float32)

    @pl.when(jnp.logical_not(first_of_b))
    def _():
        d_w0t_ref[0] = d_w0t_ref[0] + d_w0t_c
        d_b0_ref[0, 0] = d_b0_ref[0, 0] + d_b0_c
        d_w1t_ref[0] = d_w1t_ref[0] + d_w1t_c
        d_b1_ref[0, 0] = d_b1_ref[0, 0] + d_b1_c
        d_w2t_ref[0, 0] = d_w2t_ref[0, 0] + d_w2t_c
        d_b2_ref[0, 0] = d_b2_ref[0, 0] + jnp.full((128,), d_b2_c,
                                                   jnp.float32)


def _banded_bwd_call(img_bkXw, u, v, z, cur_bSCT, rays_bS3T, g_bXT,
                     planes_bd, off_bkdS, pose_meta_bk3, src_loc_bk3,
                     w0t, b0, w1t, b1, w2t, w0d, w1d, w2d,
                     *, b, k, c, d, S, w, band, tile, c_in,
                     interpret):
    """pallas_call wrapper for the backward: grid (b, S, d), d innermost
    (contiguous revisits of every accumulator block)."""
    X = img_bkXw.shape[2]
    hid0 = w0t.shape[0]
    hid1 = w1t.shape[0]
    kernel = functools.partial(_banded_bwd_kernel, k=k, c=c, d=d, S=S,
                               w=w, band=band, tile=tile)
    flops_mlp = 2 * (c_in * hid0 + hid0 * hid1 + hid1)
    outs = pl.pallas_call(
        kernel,
        grid=(b, S, d),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # planes
            pl.BlockSpec(memory_space=pltpu.SMEM),              # off
            pl.BlockSpec((1, k, 3), lambda bi, si, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # pose
            pl.BlockSpec((1, k, 3), lambda bi, si, di: (bi, 0, 0),
                         memory_space=pltpu.VMEM),              # src loc
            pl.BlockSpec((1, k, X, w),
                         lambda bi, si, di: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # img
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, si, di, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # u
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, si, di, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # v
            pl.BlockSpec((1, 1, k, tile),
                         lambda bi, si, di, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # z
            pl.BlockSpec((1, 1, c, tile),
                         lambda bi, si, di: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),              # cur
            pl.BlockSpec((1, 1, 3, tile),
                         lambda bi, si, di: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),              # rays
            pl.BlockSpec((1, 1, 1, tile),
                         lambda bi, si, di, S=S: (bi, di * S + si, 0, 0),
                         memory_space=pltpu.VMEM),              # g
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w0t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w1t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w2t
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w0d
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w1d
            pl.BlockSpec(memory_space=pltpu.VMEM),              # w2d
        ],
        out_specs=[
            pl.BlockSpec((1, k, X, w),
                         lambda bi, si, di: (bi, 0, 0, 0)),     # d_img
            pl.BlockSpec((1, 1, c, tile),
                         lambda bi, si, di: (bi, si, 0, 0)),    # d_cur
            pl.BlockSpec((1, hid0, c_in),
                         lambda bi, si, di: (bi, 0, 0)),        # d_w0t
            pl.BlockSpec((1, 1, hid0),
                         lambda bi, si, di: (bi, 0, 0)),        # d_b0
            pl.BlockSpec((1, hid1, hid0),
                         lambda bi, si, di: (bi, 0, 0)),        # d_w1t
            pl.BlockSpec((1, 1, hid1),
                         lambda bi, si, di: (bi, 0, 0)),        # d_b1
            pl.BlockSpec((1, 1, hid1),
                         lambda bi, si, di: (bi, 0, 0)),        # d_w2t
            pl.BlockSpec((1, 1, 128),
                         lambda bi, si, di: (bi, 0, 0)),        # d_b2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, X, w), jnp.float32),
            jax.ShapeDtypeStruct((b, S, c, tile), jnp.float32),
            jax.ShapeDtypeStruct((b, hid0, c_in), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hid0), jnp.float32),
            jax.ShapeDtypeStruct((b, hid1, hid0), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hid1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hid1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=b * d * S * tile * (3 * flops_mlp
                                      + 6 * k * band * c * w // tile
                                      * tile),
            bytes_accessed=2 * img_bkXw.size * img_bkXw.dtype.itemsize
            + 4 * b * k * d * S * tile * 4,
            transcendentals=b * d * S * tile * k),
    )(planes_bd, off_bkdS, pose_meta_bk3, src_loc_bk3, img_bkXw,
      u, v, z, cur_bSCT, rays_bS3T, g_bXT,
      w0t, b0, w1t, b1, w2t, w0d, w1d, w2d)
    return outs


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "tile_w", "bands",
                                    "interpret"))
def banded_warp_feature_volume_bwd(src_feats_bkhwc: jnp.ndarray,
                                   cur_bNc: jnp.ndarray,
                                   src_extrinsics_bk44: jnp.ndarray,
                                   src_Ks_bk44: jnp.ndarray,
                                   cur_invK_b44: jnp.ndarray,
                                   depth_planes_bd: jnp.ndarray,
                                   pose_meta_bk3: jnp.ndarray,
                                   src_loc_bk3: jnp.ndarray,
                                   w0, b0, w1, b1, w2, b2,
                                   g_bdN: jnp.ndarray,
                                   tile_h: int = 4,
                                   tile_w: int = 128,
                                   bands: Tuple[int, ...] = (16, 32),
                                   interpret: bool = False):
    """Hand-written backward of the banded fused sweep as a Pallas
    kernel: given the output cotangent g (b, d, N), returns
    (d_src (b,k,h,w,c), d_cur (b,N,c), d_w0, d_b0, d_w1, d_b1, d_w2,
    d_b2) — gradients w.r.t. features and MLP weights only (geometry is
    data). Same tiering as the forward.
    """
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    f32 = jnp.float32
    dtype = w0.dtype
    c_in = w0.shape[0]

    p = _banded_prep(src_feats_bkhwc, cur_bNc, src_Ks_bk44,
                     src_extrinsics_bk44, cur_invK_b44, depth_planes_bd,
                     dtype, tile_h, tile_w, bands)
    th, tw, S, tile = p["th"], p["tw"], p["S"], p["tile"]

    # cotangent in step-major tile order, (b, d*S, 1, T)
    g = g_bdN.astype(f32).reshape(b, d, h // th, th, w // tw, tw)
    g = g.transpose(0, 1, 2, 4, 3, 5).reshape(b, d * S, 1, tile)

    w0t = jnp.transpose(w0).astype(dtype)
    w1t = jnp.transpose(w1).astype(dtype)
    w2t = jnp.transpose(w2).astype(dtype)
    w0d = w0.astype(dtype)
    w1d = w1.astype(dtype)
    w2d = w2.astype(dtype)
    b0f = b0.astype(f32)
    b1f = b1.astype(f32)

    def run(band, off_bkdS):
        return _banded_bwd_call(
            p["img_bkXw"], p["u_t"], p["v_t"], p["z_t"], p["cur_bSCT"],
            p["rays_bS3T"], g, depth_planes_bd, off_bkdS,
            pose_meta_bk3.astype(f32), src_loc_bk3.astype(f32),
            w0t, b0f, w1t, b1f, w2t, w0d, w1d, w2d,
            b=b, k=k, c=c, d=d, S=S, w=w, band=band, tile=tile,
            c_in=c_in, interpret=interpret)

    def tiered(i):
        if i == len(p["band_list"]):
            return run(h, p["zero_off"])
        return jax.lax.cond(p["fits"][i],
                            lambda: run(p["band_list"][i], p["offs"][i]),
                            lambda: tiered(i + 1))

    (d_img, d_cur_t, d_w0t, d_b0, d_w1t, d_b1, d_w2t, d_b2) = tiered(0)

    # undo the (y, c)-major image layout: (b, k, h*c, w) -> (b,k,h,w,c)
    d_src = d_img.reshape(b, k, h, c, w).transpose(0, 1, 2, 4, 3)

    # un-tile d_cur: (b, S, c, T) -> (b, N, c)
    d_cur = d_cur_t.transpose(0, 1, 3, 2).reshape(
        b, h // th, w // tw, th, tw, c)
    d_cur = d_cur.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * w, c)

    d_w0 = jnp.sum(d_w0t, axis=0).T                    # (C_in, 128)
    d_b0r = jnp.sum(d_b0, axis=0)[0]                   # (128,)
    d_w1 = jnp.sum(d_w1t, axis=0).T
    d_b1r = jnp.sum(d_b1, axis=0)[0]
    d_w2 = jnp.sum(d_w2t, axis=0).reshape(w1.shape[1], 1)
    d_b2r = jnp.sum(d_b2[:, 0, 0], axis=0).reshape(1)
    return (d_src, d_cur, d_w0, d_b0r, d_w1, d_b1r, d_w2, d_b2r)
