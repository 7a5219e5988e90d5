"""Plane-sweep warping primitives for the cost/feature volume (pure JAX).

This is the XLA formulation of the reference's hot loop
(`modules/cost_volume.py:139-234` slow / `:812-964` fast): backproject the
reference pixel grid at each hypothesis depth, project into every source
view, and bilinearly sample source features — all views x planes batched
into a single gather so XLA can fuse and tile it. Geometry runs in fp32
(the reference keeps pose math in fp32 islands under AMP as well);
sampling runs in the feature dtype.

Shapes: b batch, k source views, d depth planes (or a chunk of them),
N = h*w reference pixels, c feature channels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from simplerecon_tpu.ops import geometry as geo
from simplerecon_tpu.ops.sampling import grid_sample


def generate_depth_planes(batch_size: int, num_depth_bins: int,
                          min_depth, max_depth) -> jnp.ndarray:
    """Log-spaced depth hypotheses (`modules/cost_volume.py:100-136`).

    Returns (b, d) plane depths, identical for every pixel.
    """
    ramp = jnp.linspace(0.0, 1.0, num_depth_bins, dtype=jnp.float32)
    min_d = jnp.asarray(min_depth, jnp.float32)
    max_d = jnp.asarray(max_depth, jnp.float32)
    planes = jnp.exp(jnp.log(min_d) + jnp.log(max_d / min_d) * ramp)
    return jnp.broadcast_to(planes[None], (batch_size, num_depth_bins))


class SweepWarp(NamedTuple):
    """Per-plane warp products for one chunk of depth planes."""
    world_points_bdN3: jnp.ndarray   # ref-camera-frame 3D points (fp32)
    sampled_bkdNc: jnp.ndarray       # warped source features
    depths_bkdN: jnp.ndarray         # projected depth into each source view
    mask_bkdN: jnp.ndarray           # depth-validity (z > 0), feature dtype
    pix_bkdN2: jnp.ndarray           # raw pixel coords in each source view


def sweep_warp(src_feats_bkhwc: jnp.ndarray,
               src_extrinsics_bk44: jnp.ndarray,
               src_Ks_bk44: jnp.ndarray,
               cur_invK_b44: jnp.ndarray,
               depth_planes_bd: jnp.ndarray,
               backend: str = "matmul") -> SweepWarp:
    """Warps every source view to the reference view at each depth plane.

    `backend="matmul"` (default) routes to `sweep_warp_matmul` — exact
    same bilinear taps computed on the MXU instead of via gathers,
    ~10x faster on TPU. `backend="gather"` keeps the original
    grid_sample formulation (useful as a reference for parity tests).

    Args:
        src_feats_bkhwc: (b, k, h, w, c) source matching features.
        src_extrinsics_bk44: (b, k, 4, 4) src_cam_T_cur_cam (fp32).
        src_Ks_bk44: (b, k, 4, 4) source intrinsics at matching scale.
        cur_invK_b44: (b, 4, 4) reference inverse intrinsics.
        depth_planes_bd: (b, d) hypothesis depths (fp32).
    """
    if backend == "matmul":
        return sweep_warp_matmul(src_feats_bkhwc, src_extrinsics_bk44,
                                 src_Ks_bk44, cur_invK_b44,
                                 depth_planes_bd)

    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    n = h * w

    # Backproject the pixel grid at every plane: rays (b, N, 3) scaled by
    # depth -> (b, d, N, 3) in the reference camera frame ("world" for the
    # sweep, as in `modules/cost_volume.py:183-185`).
    grid_N3 = geo.pixel_grid(h, w)
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3,
                          cur_invK_b44[:, :3, :3].astype(jnp.float32))
    world_bdN3 = rays_bN3[:, None] * depth_planes_bd[..., None, None]

    # Project into each source view with the safe homogeneous divide.
    uvz_bkdN3 = geo.project_points(
        world_bdN3[:, None],
        src_Ks_bk44[:, :, None].astype(jnp.float32),
        src_extrinsics_bk44[:, :, None].astype(jnp.float32))
    pix_bkdN2 = uvz_bkdN3[..., :2]
    depths_bkdN = uvz_bkdN3[..., 2]

    # Normalize for sampling: x' = 2 * u / w - 1 (half-pixel convention).
    scale = jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
    grid_bkdN2 = pix_bkdN2 * scale - 1.0

    sampled = grid_sample(
        src_feats_bkhwc.reshape(b * k, h, w, c),
        grid_bkdN2.reshape(b * k, d * n, 2),
        mode="bilinear").reshape(b, k, d, n, c)

    mask_bkdN = (depths_bkdN > 0).astype(src_feats_bkhwc.dtype)
    return SweepWarp(world_bdN3, sampled, depths_bkdN, mask_bkdN, pix_bkdN2)


def _twohot(coord, size: int, dtype):
    """Two-hot bilinear row: weights at floor/floor+1, zero out of range.

    coord: (..., r) sample positions in index space. Returns
    (..., r, size) with exactly the bilinear tap weights of
    grid_sample's zeros-padding semantics.

    The tent identity `relu(1 - |coord - j|)` equals the bilinear tap
    weight at every integer column j — including the half-open edges
    (coord in (-1, 0) puts weight 1+coord on column 0) — and costs 4
    elementwise passes instead of the ~14 of the floor/compare/clip
    formulation (this construction runs on the VPU inside the sweep's
    hot loop).
    """
    iota = jax.lax.broadcasted_iota(jnp.float32, coord.shape + (size,),
                                    coord.ndim)
    w = 1.0 - jnp.abs(coord[..., None] - iota)
    return jnp.maximum(w, 0.0).astype(dtype)


def _largest_divisor_leq(n: int, target: int) -> int:
    t = min(n, max(1, target))
    while n % t != 0:
        t -= 1
    return t


def _band_plan(vc_bkdST, size: int, bands):
    """Tiered banding along one image axis.

    vc_bkdST: (b, k, d*S, T) sample coords along the banded axis, in
    index space. For each (view, plane, tile) the columns/rows actually
    needed are clip(floor(v), 0, size-1) .. clip(floor(v)+1, 0, size-1);
    samples with no in-range tap are excluded. A band of `v` entries at
    offset clip(lo, 0, size-v) covers the span iff the span is narrow
    enough OR sits in the last window. Returns (offs, fits, zero_off):
    per-tier offsets (b, k, d*S) int32 and per-batch-element fit flags.
    """
    b = vc_bkdST.shape[0]
    v0 = jnp.floor(vc_bkdST)
    has_tap = (vc_bkdST > -1.0) & (vc_bkdST < size)
    lo = jnp.min(jnp.where(has_tap, jnp.clip(v0, 0, size - 1), size - 1),
                 axis=-1)                        # (b, k, d*S)
    hi = jnp.max(jnp.where(has_tap, jnp.clip(v0 + 1, 0, size - 1), 0),
                 axis=-1)
    offs = [jnp.clip(lo, 0, size - v).astype(jnp.int32) for v in bands]
    fits = [jnp.all(((hi - lo <= v - 1) | (lo >= size - v))
                    .reshape(b, -1), axis=-1) for v in bands]
    return offs, fits, jnp.zeros_like(lo, dtype=jnp.int32)


def _tap_core(img_fX, u_t, v_t, off_v, cur_band: int, contract_size: int,
              c: int, dtype):
    """Exact bilinear sampling of one view's tile as two two-hot
    contractions: a (T, F) x (F, band*c) MXU matmul interpolates along
    the contract axis over its FULL size F (tent weights = exact
    zeros-padding bilinear taps, see `_twohot`), then a per-sample
    weighted reduce over the 2 banded-axis taps.

    img_fX: (F, A*c) source features, contract-axis-major, where A is
    the banded axis size; the band slice is contiguous in the last dim.
    u_t: (T,) contract-axis coords; v_t: (T,) banded-axis coords;
    off_v: scalar band offset for this (view, step).
    """
    sl = jax.lax.dynamic_slice(
        img_fX, (0, off_v * c), (contract_size, cur_band * c))
    ohu = _twohot(u_t, contract_size, dtype)       # (T, F)
    rows = jnp.einsum("tf,fX->tX", ohu, sl,
                      preferred_element_type=jnp.float32)
    rows = rows.reshape(u_t.shape[0], cur_band, c)
    vo = v_t - off_v.astype(jnp.float32)
    ohv = _twohot(vo, cur_band, jnp.float32)       # (T, band)
    return jnp.einsum("tv,tvc->tc", ohv, rows)     # (T, c) f32


def _band_axis_config(h: int, w: int, band_axis: str,
                      tile_h: Optional[int], tile_w: Optional[int],
                      band: Optional[int]):
    """Resolve (tile_h, tile_w, bands) defaults for a banding axis.

    band_axis="x" (default): full-height column stripes, contract over
    the image height on the MXU, band the x taps (40/64 tiers) — the
    fastest measured XLA-scan configuration (11.3 ms warp on hero
    shapes).

    band_axis="y": full-width row stripes, contract over the width,
    band the y taps (16/32 tiers). On paper the y band is narrower
    (N = band*c shrinks ~2.5x; MXU passes cost M*N regardless of the
    contraction size, so K-utilization is irrelevant), but measured on
    hero shapes it LOSES in the scan formulation (14.8-25.8 ms):
    epipolar tilt from yaw makes y vary across a full-width stripe
    (span ~ tile_h + tilt*w), so the narrow tiers miss and fall back,
    and the 3x higher step count pays ~5-7 us scan overhead per step.
    Kept as an exact alternative; the Pallas banded kernel uses the "y"
    geometry with narrow tiles where per-step overhead is ~zero.
    """
    if band_axis == "y":
        th = _largest_divisor_leq(h, 8 if tile_h is None else tile_h)
        tw = _largest_divisor_leq(w, w if tile_w is None else tile_w)
        if band is None:
            bands = [v for v in (16, 32) if v < h]
        else:
            bands = [band] if band < h else []
        return th, tw, bands
    th = _largest_divisor_leq(h, h if tile_h is None else tile_h)
    tw = _largest_divisor_leq(w, 32 if tile_w is None else tile_w)
    if band is None:
        bands = [v for v in (40, 64) if v < w]
    else:
        bands = [band] if band < w else []
    return th, tw, bands


def sweep_warp_matmul(src_feats_bkhwc: jnp.ndarray,
                      src_extrinsics_bk44: jnp.ndarray,
                      src_Ks_bk44: jnp.ndarray,
                      cur_invK_b44: jnp.ndarray,
                      depth_planes_bd: jnp.ndarray,
                      tile_h: Optional[int] = None,
                      tile_w: Optional[int] = None,
                      x_band: Optional[int] = None,
                      unroll: int = 1,
                      band_axis: str = "x") -> SweepWarp:
    """`sweep_warp` with the bilinear gather recast as MXU matmuls.

    TPU gathers are row-latency-bound: the 4-tap grid_sample warp of the
    hero model measures ~200 ms (98% of the forward) for ~22M 32-byte
    rows. Instead, exact bilinear sampling is computed as two separable
    "two-hot" contractions: a (T, h) x (h, band*c) matmul interpolates
    in y, then a weighted reduce over the x taps. Numerically identical
    to grid_sample (same tap weights, zeros padding), but dense MXU
    work instead of gathers.

    MXU economics: the y-contraction dim is h <= 128, i.e. a single
    systolic pass, so its cost is M x N regardless of how many source
    rows actually carry tap weight. The lever is N = band*c: the
    reference pixels are processed as (tile_h, tile_w) image tiles and
    each (view, plane, tile) reads only a band-column slice of the
    source image around the tile's projected x-range. Column offsets
    are data-dependent, so banding is TIERED per batch element: try the
    narrow band, then the wide one, then the exact full-width sweep —
    `lax.cond` picks the narrowest tier whose band covers every tile's
    x-spread for that element. Banding never changes the result
    (parity-tested incl. forced fallbacks). Measured on hero geometry
    (96x128x16, 64 planes, 7 views): gather 202.9 ms, full-width
    matmul 124.8 ms, tiered band-40 11.8 ms.

    Batch elements are processed under `lax.map`, so per-frame time is
    batch-size-invariant by construction (one batch's (T, band*c)
    intermediates stay small enough for XLA to keep the matmul ->
    tap-reduce chain fused; batched variants measured 4x slower at b8),
    and one pathological frame only degrades itself.

    `band_axis` picks which image axis is banded ("y" default — see
    `_band_axis_config`); `x_band` is the band width along that axis.
    """
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    n = h * w
    dtype = src_feats_bkhwc.dtype
    f32 = jnp.float32

    th, tw, bands = _band_axis_config(h, w, band_axis, tile_h, tile_w,
                                      x_band)
    T = th * tw                      # samples per tile
    S = (h // th) * (w // tw)        # tiles per plane
    contract_size = w if band_axis == "y" else h
    band_size = h if band_axis == "y" else w

    grid_N3 = geo.pixel_grid(h, w)
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3,
                          cur_invK_b44[:, :3, :3].astype(f32))
    world_bdN3 = rays_bN3[:, None] * depth_planes_bd[..., None, None]

    uvz_bkdN3 = geo.project_points(
        world_bdN3[:, None],
        src_Ks_bk44[:, :, None].astype(f32),
        src_extrinsics_bk44[:, :, None].astype(f32))
    pix_bkdN2 = uvz_bkdN3[..., :2]
    depths_bkdN = uvz_bkdN3[..., 2]

    def tiled(a_bkdN):
        """(b, k, d, h*w) -> (b, k, d*S, T) in tile-major order."""
        a = a_bkdN.reshape(b, k, d, h // th, th, w // tw, tw)
        a = a.transpose(0, 1, 2, 3, 5, 4, 6)
        return a.reshape(b, k, d * S, T)

    # index-space sample coords (half-pixel convention: centers at i+0.5)
    x = tiled(pix_bkdN2[..., 0] - 0.5)          # (b, k, d*S, T)
    y = tiled(pix_bkdN2[..., 1] - 0.5)
    u, v = (x, y) if band_axis == "y" else (y, x)  # contract, banded

    offs, fits, zero_off = _band_plan(v, band_size, bands)

    # contract-axis-major image layout: the band slice is contiguous
    if band_axis == "y":
        img_bkfX = src_feats_bkhwc.transpose(0, 1, 3, 2, 4).reshape(
            b, k, w, h * c)
    else:
        img_bkfX = src_feats_bkhwc.reshape(b, k, h, w * c)

    def sweep_one(args):
        """One batch element; scan over the d*S tile axis per tier."""
        img_kfX, u_kST, v_kST, offs_1, fits_1 = args

        def run(cur_band: int, off_kS):
            # remat each scan step: without this, the scan's backward
            # stores every step's (T, band*c) row intermediates for all
            # d*S steps x batch — 38 GB at train batch 16. Recomputing
            # them per step costs ~2x warp FLOPs in backward only.
            @jax.checkpoint
            def step(_, xs):
                u_t, v_t, off_t = xs             # (k, T), (k, T), (k,)

                def one_view(img_fX, u_v, v_v, off_v):
                    return _tap_core(img_fX, u_v, v_v, off_v, cur_band,
                                     contract_size, c, dtype
                                     ).astype(dtype)

                out = jax.vmap(one_view)(img_kfX, u_t, v_t, off_t)
                return None, out                 # (k, T, c)

            xs = (u_kST.transpose(1, 0, 2), v_kST.transpose(1, 0, 2),
                  off_kS.transpose(1, 0))
            _, outs = jax.lax.scan(step, None, xs, unroll=unroll)
            return outs                          # (d*S, k, T, c)

        def tiered(i: int):
            if i == len(bands):
                return run(band_size, zero_off[0])
            return jax.lax.cond(fits_1[i],
                                lambda: run(bands[i], offs_1[i]),
                                lambda: tiered(i + 1))
        return tiered(0)

    outs = jax.lax.map(
        sweep_one,
        (img_bkfX, u, v, tuple(offs), tuple(fits)))

    # (b, d*S, k, T, c) -> (b, k, d, N, c) undoing the tile ordering
    sampled = outs.transpose(0, 2, 1, 3, 4).reshape(
        b, k, d, h // th, w // tw, th, tw, c)
    sampled = sampled.transpose(0, 1, 2, 3, 5, 4, 6, 7).reshape(
        b, k, d, n, c)

    mask_bkdN = (depths_bkdN > 0).astype(dtype)
    return SweepWarp(world_bdN3, sampled, depths_bkdN, mask_bkdN,
                     pix_bkdN2)


class _FusedPrep(NamedTuple):
    """Shared geometry/tiling prep for the fused sweep fwd AND bwd
    (`sweep_mlp_volume` / its custom VJP) — one code path so the
    backward recomputation can never drift from the forward."""
    img_bkfX: jnp.ndarray      # (b, k, F, A*c) contract-axis-major
    u: jnp.ndarray             # (b, k, d*S, T) contract-axis coords
    v: jnp.ndarray             # (b, k, d*S, T) banded-axis coords
    z: jnp.ndarray             # (b, k, d*S, T) projected depths
    rays_t: jnp.ndarray        # (b, d*S, T, 3)
    cur_t: jnp.ndarray         # (b, d*S, T, c)
    plane_t: jnp.ndarray       # (b, d*S)
    offs: tuple                # per-tier (b, k, d*S) int32
    fits: tuple                # per-tier (b,) bool
    zero_off: jnp.ndarray


def _fused_prep(src_feats_bkhwc, cur_bNc, src_extrinsics_bk44,
                src_Ks_bk44, cur_invK_b44, depth_planes_bd,
                compute_dtype, th: int, tw: int, bands,
                band_axis: str) -> _FusedPrep:
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    dtype = compute_dtype
    f32 = jnp.float32
    T = th * tw
    S = (h // th) * (w // tw)
    band_size = h if band_axis == "y" else w

    grid_N3 = geo.pixel_grid(h, w)
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3,
                          cur_invK_b44[:, :3, :3].astype(f32))
    world_bdN3 = rays_bN3[:, None] * depth_planes_bd[..., None, None]
    uvz_bkdN3 = geo.project_points(
        world_bdN3[:, None],
        src_Ks_bk44[:, :, None].astype(f32),
        src_extrinsics_bk44[:, :, None].astype(f32))

    def tiled_kd(a_bkdN):
        a = a_bkdN.reshape(b, k, d, h // th, th, w // tw, tw)
        a = a.transpose(0, 1, 2, 3, 5, 4, 6)
        return a.reshape(b, k, d * S, T)

    def tiled_pix(a_bNe):
        e = a_bNe.shape[-1]
        a = a_bNe.reshape(b, h // th, th, w // tw, tw, e)
        a = a.transpose(0, 1, 3, 2, 4, 5).reshape(b, S, T, e)
        return jnp.broadcast_to(a[:, None], (b, d, S, T, e)
                                ).reshape(b, d * S, T, e)

    x = tiled_kd(uvz_bkdN3[..., 0] - 0.5)       # (b, k, d*S, T)
    y = tiled_kd(uvz_bkdN3[..., 1] - 0.5)
    z = tiled_kd(uvz_bkdN3[..., 2])             # projected depth (z+eps)
    rays_t = tiled_pix(rays_bN3)                # (b, d*S, T, 3)
    cur_t = tiled_pix(cur_bNc.astype(dtype))    # (b, d*S, T, c)
    plane_t = jnp.repeat(depth_planes_bd, S, axis=1)  # (b, d*S)

    u, v = (x, y) if band_axis == "y" else (y, x)  # contract, banded
    offs, fits, zero_off = _band_plan(v, band_size, bands)

    if band_axis == "y":
        img_bkfX = src_feats_bkhwc.transpose(0, 1, 3, 2, 4).reshape(
            b, k, w, h * c).astype(dtype)
    else:
        img_bkfX = src_feats_bkhwc.reshape(b, k, h, w * c).astype(dtype)
    return _FusedPrep(img_bkfX, u, v, z, rays_t, cur_t, plane_t,
                      tuple(offs), tuple(fits), zero_off)


def sweep_mlp_volume(src_feats_bkhwc: jnp.ndarray,
                     cur_bNc: jnp.ndarray,
                     src_extrinsics_bk44: jnp.ndarray,
                     src_Ks_bk44: jnp.ndarray,
                     cur_invK_b44: jnp.ndarray,
                     depth_planes_bd: jnp.ndarray,
                     pose_penalty_bk3: jnp.ndarray,
                     src_cam_loc_bk3: jnp.ndarray,
                     mlp_params,
                     compute_dtype=jnp.bfloat16,
                     tile_h: Optional[int] = None,
                     tile_w: Optional[int] = None,
                     x_band: Optional[int] = None,
                     unroll: int = 2,
                     band_axis: str = "x",
                     custom_vjp: bool = False) -> jnp.ndarray:
    """Banded MXU warp with the metadata MLP fused into the sweep.

    Same tiered column-banded two-hot warp as `sweep_warp_matmul`, but
    each scan step immediately assembles the 202-channel metadata vector
    (exact reference order, `modules/cost_volume.py:709-723`) and runs
    the MLP on the tile — so neither the (b, k, d, N, c) warp stack nor
    the (b, d, N, 202) MLP input ever exists in HBM. The per-step MLP
    is three more MXU matmuls ((T,202)x(202,128) etc.), ~0.3 ms total
    on hero shapes, in exchange for several ms of stack traffic.

    mlp_params: ((w0, b0), (w1, b1), (w2, b2)) — Dense kernels of shape
    (in, out), LeakyReLU(0.01) between layers (reference MLP semantics,
    `modules/networks.py:129-147`).

    `custom_vjp=True` routes to `sweep_mlp_volume_cvjp` — a hand-written
    backward (gradients w.r.t. features and MLP weights only; geometry
    is treated as data, as in reference training where poses never
    receive gradients).

    Returns (b, d, N) fp32 matching scores.
    """
    if custom_vjp:
        (w0, b0), (w1, b1), (w2, b2) = mlp_params
        fwd_impl = custom_vjp if isinstance(custom_vjp, str) else "xla"
        return _cvjp_builder(
            jnp.dtype(compute_dtype).name, tile_h, tile_w, x_band,
            unroll, band_axis, fwd_impl)(
                src_feats_bkhwc, cur_bNc, src_extrinsics_bk44,
                src_Ks_bk44, cur_invK_b44, depth_planes_bd,
                pose_penalty_bk3, src_cam_loc_bk3, w0, b0, w1, b1, w2,
                b2)

    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    dtype = compute_dtype

    th, tw, bands = _band_axis_config(h, w, band_axis, tile_h, tile_w,
                                      x_band)
    prep = _fused_prep(src_feats_bkhwc, cur_bNc, src_extrinsics_bk44,
                       src_Ks_bk44, cur_invK_b44, depth_planes_bd,
                       dtype, th, tw, bands, band_axis)
    return _fused_forward(prep, pose_penalty_bk3, src_cam_loc_bk3,
                          mlp_params, (b, k, h, w, c, d), dtype,
                          th, tw, tuple(bands), unroll, band_axis)


def _fused_forward(prep: _FusedPrep, pose_penalty_bk3, src_cam_loc_bk3,
                   mlp_params, dims, dtype, th, tw, bands, unroll,
                   band_axis) -> jnp.ndarray:
    """Scan body of the fused sweep, operating on a `_FusedPrep`."""
    b, k, h, w, c, d = dims
    n = h * w
    f32 = jnp.float32
    T = th * tw
    S = (h // th) * (w // tw)
    contract_size = w if band_axis == "y" else h
    band_size = h if band_axis == "y" else w

    img_bkfX, u, v, z = prep.img_bkfX, prep.u, prep.v, prep.z
    rays_t, cur_t, plane_t = prep.rays_t, prep.cur_t, prep.plane_t
    offs, fits, zero_off = prep.offs, prep.fits, prep.zero_off

    (w0, b0), (w1, b1), (w2, b2) = mlp_params
    w0 = w0.astype(dtype)
    w1 = w1.astype(dtype)
    w2 = w2.astype(dtype)

    def volume_one(args):
        (img_kfX, u_kST, v_kST, z_kST, rays_ST3, cur_STc, plane_S,
         penalty_k3, loc_k3, offs_1, fits_1) = args

        # the last 3k metadata channels (penalty, R, t) are per-frame
        # constants: their first-layer contribution is a fixed (128,)
        # bias — computed once here instead of broadcast+matmul'd in
        # every scan step. w0 row order: [..., penalty(k), R(k), t(k)].
        pose_flat = penalty_k3.T.reshape(3 * k)            # (3k,)
        w0_var = w0[:-3 * k]
        pose_bias = jnp.dot(pose_flat.astype(w0.dtype), w0[-3 * k:],
                            preferred_element_type=jnp.float32)

        def run(cur_band: int, off_kS):
            @jax.checkpoint
            def step(_, xs):
                u_t, v_t, z_t, off_t, rays0, cur, plane = xs

                def one_view(img_fX, u_v, v_v, off_v):
                    return _tap_core(img_fX, u_v, v_v, off_v, cur_band,
                                     contract_size, c, dtype
                                     ).astype(dtype)

                sampled = jax.vmap(one_view)(img_kfX, u_t, v_t, off_t)

                # metadata assembly, exact reference channel order
                mask = (z_t > 0).astype(f32)                   # (k, T)
                cur_f = cur.astype(f32)                        # (T, c)
                dots = jnp.einsum("ktc,tc->kt",
                                  sampled.astype(f32), cur_f) * mask
                world = rays0 * plane                          # (T, 3)
                cur_ray = geo.normalize(world, axis=-1)
                src_rays = geo.normalize(
                    world[None] - loc_k3[:, None, :], axis=-1)  # (k,T,3)
                angle = geo.cosine_similarity(
                    cur_ray[None], src_rays, axis=-1, eps=1e-5)  # (k,T)

                feats = jnp.concatenate(
                    [sampled.transpose(1, 0, 2).reshape(T, k * c),
                     cur_f,
                     mask.T, z_t.T,
                     jnp.full((T, 1), plane, f32),
                     dots.T, angle.T,
                     cur_ray,
                     src_rays.transpose(1, 0, 2).reshape(T, k * 3)],
                    axis=-1).astype(dtype)             # (T, C_in - 3k)

                h0 = jnp.dot(feats, w0_var,
                             preferred_element_type=f32) + pose_bias + b0
                h0 = jax.nn.leaky_relu(h0, 0.01).astype(dtype)
                h1 = jnp.dot(h0, w1,
                             preferred_element_type=f32) + b1
                h1 = jax.nn.leaky_relu(h1, 0.01).astype(dtype)
                out = jnp.dot(h1, w2,
                              preferred_element_type=f32) + b2
                return None, out[:, 0]                         # (T,)

            xs = (u_kST.transpose(1, 0, 2), v_kST.transpose(1, 0, 2),
                  z_kST.transpose(1, 0, 2), off_kS.transpose(1, 0),
                  rays_ST3, cur_STc, plane_S)
            _, outs = jax.lax.scan(step, None, xs, unroll=unroll)
            return outs                                        # (d*S, T)

        def tiered(i: int):
            if i == len(bands):
                return run(band_size, zero_off[0])
            return jax.lax.cond(fits_1[i],
                                lambda: run(bands[i], offs_1[i]),
                                lambda: tiered(i + 1))
        return tiered(0)

    outs = jax.lax.map(
        volume_one,
        (img_bkfX, u, v, z, rays_t, cur_t, plane_t,
         pose_penalty_bk3.astype(f32), src_cam_loc_bk3.astype(f32),
         tuple(offs), tuple(fits)))                            # (b,d*S,T)

    vol = outs.reshape(b, d, h // th, w // tw, th, tw)
    vol = vol.transpose(0, 1, 2, 4, 3, 5).reshape(b, d, n)
    return vol


@functools.lru_cache(maxsize=None)
def _cvjp_builder(dtype_name: str, tile_h, tile_w, x_band, unroll: int,
                  band_axis: str, fwd_impl: str = "xla"):
    """Builds the custom-VJP fused sweep for one static config.

    Rationale (the round-2 train-step bottleneck): the stock fused sweep
    wraps every scan step in `jax.checkpoint`, so autodiff's backward
    replays the step AND transposes every op in it — including the
    two-hot tap construction and the projection chain, whose cotangents
    flow only to poses/intrinsics that are DATA, never trained (the
    reference likewise never backprops into poses: only network params
    receive gradients, `/root/reference/experiment_modules/
    depth_model.py:409-444`). This hand-written VJP stores nothing per
    step (residuals are just the primal inputs), recomputes each step's
    forward once in the backward scan, and propagates cotangents ONLY to
    the source/current features and the MLP weights — all as dense MXU
    matmuls (the transpose of a two-hot contraction is a two-hot
    contraction). Geometry args receive symbolic zeros.
    """
    dtype = jnp.dtype(dtype_name)
    f32 = jnp.float32

    def primal(src_feats, cur_bNc, extr, Ks, invK, planes, penalty, loc,
               w0, b0, w1, b1, w2, b2):
        return sweep_mlp_volume(
            src_feats, cur_bNc, extr, Ks, invK, planes, penalty, loc,
            ((w0, b0), (w1, b1), (w2, b2)), compute_dtype=dtype,
            tile_h=tile_h, tile_w=tile_w, x_band=x_band, unroll=unroll,
            band_axis=band_axis, custom_vjp=False)

    fused = jax.custom_vjp(primal)

    if fwd_impl == "pallas_bwd":
        # both passes are Pallas kernels: the banded fused forward and
        # its hand-written backward (`pallas_cv.py::
        # banded_warp_feature_volume_bwd`). Residuals are just the
        # primal inputs — geometry/tiling prep is recomputed inside
        # each kernel wrapper (cheap XLA, nothing large stored).
        def fwd_pl(src_feats, cur_bNc, extr, Ks, invK, planes, penalty,
                   loc, w0, b0, w1, b1, w2, b2):
            from simplerecon_tpu.ops import pallas_cv
            interp = jax.default_backend() != "tpu"
            out = pallas_cv.banded_warp_feature_volume(
                src_feats, cur_bNc, extr, Ks, invK, planes, penalty,
                loc, w0.astype(dtype), b0, w1.astype(dtype), b1,
                w2.astype(dtype), b2, interpret=interp)
            return out, (src_feats, cur_bNc, extr, Ks, invK, planes,
                         penalty, loc, w0, b0, w1, b1, w2, b2)

        def bwd_pl(res, g_bdN):
            (src_feats, cur_bNc, extr, Ks, invK, planes, penalty, loc,
             w0, b0, w1, b1, w2, b2) = res
            from simplerecon_tpu.ops import pallas_cv
            interp = jax.default_backend() != "tpu"
            (d_src, d_cur, d_w0, d_b0, d_w1, d_b1, d_w2,
             d_b2) = pallas_cv.banded_warp_feature_volume_bwd(
                src_feats, cur_bNc, extr, Ks, invK, planes, penalty,
                loc, w0.astype(dtype), b0, w1.astype(dtype), b1,
                w2.astype(dtype), b2, g_bdN, interpret=interp)
            zeros = (jnp.zeros_like(extr), jnp.zeros_like(Ks),
                     jnp.zeros_like(invK), jnp.zeros_like(planes),
                     jnp.zeros_like(penalty), jnp.zeros_like(loc))
            return ((d_src.astype(src_feats.dtype),
                     d_cur.astype(cur_bNc.dtype))
                    + zeros
                    + (d_w0.astype(w0.dtype), d_b0.astype(b0.dtype),
                       d_w1.astype(w1.dtype), d_b1.astype(b1.dtype),
                       d_w2.astype(w2.dtype), d_b2.astype(b2.dtype)))

        fused.defvjp(fwd_pl, bwd_pl)
        return fused

    def fwd(src_feats, cur_bNc, extr, Ks, invK, planes, penalty, loc,
            w0, b0, w1, b1, w2, b2):
        # compute the tiling/projection prep ONCE and pass it to the
        # backward through the residuals (recomputing it in bwd costs a
        # second round of big fp32 transposes; autodiff keeps the scan
        # xs alive too, so this matches its memory footprint)
        b, k, h, w, c = src_feats.shape
        th, tw, bands = _band_axis_config(h, w, band_axis, tile_h,
                                          tile_w, x_band)
        prep = _fused_prep(src_feats, cur_bNc, extr, Ks, invK, planes,
                           dtype, th, tw, bands, band_axis)
        if fwd_impl == "pallas":
            # hybrid: the banded Pallas kernel computes the primal
            # (3.6 ms vs 13.9 ms for the XLA scan on hero shapes); the
            # hand-written XLA backward below is unchanged — it is the
            # VJP of the same mathematical function (outputs agree to
            # bf16 rounding, parity-tested on chip)
            from simplerecon_tpu.ops import pallas_cv
            interp = jax.default_backend() != "tpu"
            out = pallas_cv.banded_warp_feature_volume(
                src_feats, cur_bNc, extr, Ks, invK, planes, penalty,
                loc, w0.astype(dtype), b0, w1.astype(dtype), b1,
                w2.astype(dtype), b2, interpret=interp)
        else:
            out = _fused_forward(prep, penalty, loc,
                                 ((w0, b0), (w1, b1), (w2, b2)),
                                 (b, k, h, w, c, planes.shape[1]),
                                 dtype, th, tw, tuple(bands), unroll,
                                 band_axis)
        res = (prep, src_feats, cur_bNc, extr, Ks, invK,
               planes, penalty, loc, w0, b0, w1, b1, w2, b2)
        return out, res

    def bwd(res, g_bdN):
        (prep, src_feats, cur_bNc, extr, Ks, invK, planes, penalty,
         loc, w0, b0, w1, b1, w2, b2) = res
        src_dtype, cur_dtype = src_feats.dtype, cur_bNc.dtype
        b, k = prep.u.shape[:2]
        d = planes.shape[1]
        c = prep.cur_t.shape[-1]
        if band_axis == "y":
            w = prep.img_bkfX.shape[2]
            h = prep.img_bkfX.shape[3] // c
        else:
            h = prep.img_bkfX.shape[2]
            w = prep.img_bkfX.shape[3] // c

        th, tw, bands = _band_axis_config(h, w, band_axis, tile_h,
                                          tile_w, x_band)
        T = th * tw
        S = (h // th) * (w // tw)
        contract_size = w if band_axis == "y" else h
        band_size = h if band_axis == "y" else w

        # incoming cotangent, tiled to the scan's step order
        g = g_bdN.astype(f32).reshape(b, d, h // th, th, w // tw, tw)
        g = g.transpose(0, 1, 2, 4, 3, 5).reshape(b, d * S, T)

        w0d, w1d, w2d = (w0.astype(dtype), w1.astype(dtype),
                         w2.astype(dtype))
        w0f, w1f, w2f = (w0.astype(f32), w1.astype(f32),
                         w2.astype(f32))

        def grad_one(args):
            (img_kfX, u_kST, v_kST, z_kST, rays_ST3, cur_STc, plane_S,
             penalty_k3, loc_k3, offs_1, fits_1, g_ST) = args

            pose_flat = penalty_k3.T.reshape(3 * k)          # (3k,)
            w0_var = w0d[:-3 * k]
            pose_bias = jnp.dot(pose_flat.astype(dtype), w0d[-3 * k:],
                                preferred_element_type=f32)

            def run(cur_band: int, off_kS):
                def step(carry, xs):
                    (d_img, d_w0v, d_h0sum, d_w1a, d_b1a, d_w2a,
                     d_b2a) = carry
                    u_t, v_t, z_t, off_t, rays0, cur, plane, g_t = xs

                    # ---- recompute the forward step (same math as
                    # `sweep_mlp_volume`'s scan body) ----
                    def taps(img_fX, u_v, v_v, off_v):
                        sl = jax.lax.dynamic_slice(
                            img_fX, (0, off_v * c),
                            (contract_size, cur_band * c))
                        ohu = _twohot(u_v, contract_size, dtype)
                        rows = jnp.einsum(
                            "tf,fX->tX", ohu, sl,
                            preferred_element_type=f32)
                        rows = rows.reshape(T, cur_band, c)
                        vo = v_v - off_v.astype(f32)
                        ohv = _twohot(vo, cur_band, f32)
                        samp = jnp.einsum("tv,tvc->tc", ohv, rows)
                        return samp.astype(dtype), ohu, ohv

                    sampled, ohu_k, ohv_k = jax.vmap(taps)(
                        img_kfX, u_t, v_t, off_t)       # (k,T,c) dtype

                    mask = (z_t > 0).astype(f32)                 # (k,T)
                    cur_f = cur.astype(f32)                      # (T,c)
                    sampled_f = sampled.astype(f32)
                    dots = jnp.einsum("ktc,tc->kt", sampled_f,
                                      cur_f) * mask
                    world = rays0 * plane                        # (T,3)
                    cur_ray = geo.normalize(world, axis=-1)
                    src_rays = geo.normalize(
                        world[None] - loc_k3[:, None, :], axis=-1)
                    angle = geo.cosine_similarity(
                        cur_ray[None], src_rays, axis=-1, eps=1e-5)

                    feats = jnp.concatenate(
                        [sampled.transpose(1, 0, 2).reshape(T, k * c),
                         cur_f, mask.T, z_t.T,
                         jnp.full((T, 1), plane, f32),
                         dots.T, angle.T, cur_ray,
                         src_rays.transpose(1, 0, 2).reshape(T, k * 3)],
                        axis=-1).astype(dtype)          # (T, C_in - 3k)

                    h0pre = (jnp.dot(feats, w0_var,
                                     preferred_element_type=f32)
                             + pose_bias + b0)
                    h0 = jax.nn.leaky_relu(h0pre, 0.01)
                    h0d = h0.astype(dtype)
                    h1pre = jnp.dot(h0d, w1d,
                                    preferred_element_type=f32) + b1
                    h1 = jax.nn.leaky_relu(h1pre, 0.01)
                    h1d = h1.astype(dtype)

                    # ---- backward through the MLP ----
                    g_T = g_t                                     # (T,)
                    d_h1 = g_T[:, None] * w2f[None, :, 0]      # (T,128)
                    d_w2a = d_w2a + jnp.einsum(
                        "th,t->h", h1, g_T)[:, None]
                    d_b2a = d_b2a + jnp.sum(g_T)[None]
                    d_h1p = d_h1 * jnp.where(h1pre > 0, 1.0, 0.01)
                    d_h1pd = d_h1p.astype(dtype)
                    d_h0 = jnp.dot(d_h1pd, w1d.T,
                                   preferred_element_type=f32)
                    d_w1a = d_w1a + jnp.dot(
                        h0d.T, d_h1pd, preferred_element_type=f32)
                    d_b1a = d_b1a + jnp.sum(d_h1p, axis=0)
                    d_h0p = d_h0 * jnp.where(h0pre > 0, 1.0, 0.01)
                    d_h0pd = d_h0p.astype(dtype)
                    d_feats = jnp.dot(d_h0pd, w0_var.T,
                                      preferred_element_type=f32)
                    d_w0v = d_w0v + jnp.dot(
                        feats.T, d_h0pd, preferred_element_type=f32)
                    d_h0sum = d_h0sum + jnp.sum(d_h0p, axis=0)

                    # ---- split d_feats; only features carry gradient
                    # (mask/z/plane/angle/ray channels are geometry) ----
                    d_samp = d_feats[:, :k * c].reshape(
                        T, k, c).transpose(1, 0, 2)          # (k,T,c)
                    d_cur = d_feats[:, k * c:k * c + c]       # (T,c)
                    o = k * c + c + 2 * k + 1
                    d_dots = d_feats[:, o:o + k].T * mask     # (k,T)

                    # dots = sum_c sampled*cur (masked)
                    d_samp = d_samp + d_dots[:, :, None] * cur_f[None]
                    d_cur = d_cur + jnp.einsum(
                        "kt,ktc->tc", d_dots, sampled_f)

                    # ---- backward through the two-hot warp: the
                    # transpose of a two-hot contraction is a two-hot
                    # contraction (dense MXU matmul, no gathers) ----
                    def tap_bwd(d_img_v, ohu, ohv, off_v, d_s):
                        d_rows = (ohv[:, :, None] *
                                  d_s[:, None, :]).reshape(
                                      T, cur_band * c).astype(dtype)
                        d_sl = jnp.einsum(
                            "tf,tX->fX", ohu, d_rows,
                            preferred_element_type=f32)
                        acc = jax.lax.dynamic_slice(
                            d_img_v, (0, off_v * c),
                            (contract_size, cur_band * c))
                        return jax.lax.dynamic_update_slice(
                            d_img_v, acc + d_sl, (0, off_v * c))

                    d_img = jax.vmap(tap_bwd)(
                        d_img, ohu_k, ohv_k, off_t, d_samp)

                    return (d_img, d_w0v, d_h0sum, d_w1a, d_b1a,
                            d_w2a, d_b2a), d_cur

                xs = (u_kST.transpose(1, 0, 2),
                      v_kST.transpose(1, 0, 2),
                      z_kST.transpose(1, 0, 2), off_kS.transpose(1, 0),
                      rays_ST3, cur_STc, plane_S, g_ST)
                carry0 = (
                    jnp.zeros((k, contract_size, band_size * c), f32),
                    jnp.zeros((w0.shape[0] - 3 * k, w0.shape[1]), f32),
                    jnp.zeros((w0.shape[1],), f32),
                    jnp.zeros(w1.shape, f32),
                    jnp.zeros(w1.shape[1:], f32),
                    jnp.zeros(w2.shape, f32),
                    jnp.zeros(w2.shape[1:], f32))
                carry, d_cur_steps = jax.lax.scan(step, carry0, xs,
                                                  unroll=unroll)
                return carry + (d_cur_steps,)

            def tiered(i: int):
                if i == len(bands):
                    return run(band_size, prep.zero_off[0])
                return jax.lax.cond(fits_1[i],
                                    lambda: run(bands[i], offs_1[i]),
                                    lambda: tiered(i + 1))

            (d_img, d_w0v, d_h0sum, d_w1a, d_b1a, d_w2a, d_b2a,
             d_cur_steps) = tiered(0)

            # fold the pose-constant first-layer rows: their forward
            # contribution was pose_flat @ w0[-3k:]
            d_w0p = jnp.einsum("p,h->ph", pose_flat.astype(f32),
                               d_h0sum)
            d_w0 = jnp.concatenate([d_w0v, d_w0p], axis=0)

            # (d*S, T, c): sum over planes, then un-tile
            d_cur = d_cur_steps.reshape(d, S, T, c).sum(0)
            d_cur = d_cur.reshape(h // th, w // tw, th, tw, c)
            d_cur = d_cur.transpose(0, 2, 1, 3, 4).reshape(h * w, c)
            return (d_img, d_cur, d_w0, d_h0sum, d_w1a, d_b1a, d_w2a,
                    d_b2a)

        (d_img, d_cur, d_w0, d_b0, d_w1, d_b1, d_w2, d_b2) = jax.lax.map(
            grad_one,
            (prep.img_bkfX, prep.u, prep.v, prep.z, prep.rays_t,
             prep.cur_t, prep.plane_t, penalty.astype(f32),
             loc.astype(f32), prep.offs, prep.fits, g))

        # un-do the contract-axis-major image layout
        if band_axis == "y":
            d_src = d_img.reshape(b, k, w, h, c).transpose(0, 1, 3, 2, 4)
        else:
            d_src = d_img.reshape(b, k, h, w, c)

        zeros = (jnp.zeros_like(extr), jnp.zeros_like(Ks),
                 jnp.zeros_like(invK), jnp.zeros_like(planes),
                 jnp.zeros_like(penalty), jnp.zeros_like(loc))
        return ((d_src.astype(src_dtype), d_cur.astype(cur_dtype))
                + zeros
                + (d_w0.sum(0).astype(w0.dtype),
                   d_b0.sum(0).astype(b0.dtype),
                   d_w1.sum(0).astype(w1.dtype),
                   d_b1.sum(0).astype(b1.dtype),
                   d_w2.sum(0).astype(w2.dtype),
                   d_b2.sum(0).astype(b2.dtype)))

    fused.defvjp(fwd, bwd)
    return fused


def border_validity_mask(pix_bkN2: jnp.ndarray, height: int, width: int
                         ) -> jnp.ndarray:
    """Reference `get_mask`: strictly inside a 2-pixel border
    (`modules/cost_volume.py:77-97`). Returns bool (b, k, N)."""
    x, y = pix_bkN2[..., 0], pix_bkN2[..., 1]
    return (x > 2) & (x < width - 2) & (y > 2) & (y < height - 2)


def overall_source_mask(warp_last_plane: SweepWarp, height: int, width: int
                        ) -> jnp.ndarray:
    """True where ANY source view contributes valid information at the
    farthest plane (`modules/cost_volume.py:1079-1084`). Returns (b, N)."""
    depth_mask = jnp.any(warp_last_plane.mask_bkdN[:, :, -1] > 0, axis=1)
    bounds = jnp.any(border_validity_mask(
        warp_last_plane.pix_bkdN2[:, :, -1], height, width), axis=1)
    return depth_mask & bounds


def lowest_cost_depth(cost_volume_bhwd: jnp.ndarray,
                      depth_planes_bd: jnp.ndarray) -> jnp.ndarray:
    """Argmax-likelihood depth from the volume, for visualization and raw
    fusion (`modules/cost_volume.py:338-342, 373-378`). Returns (b, h, w)."""
    idx = jnp.argmax(cost_volume_bhwd, axis=-1)
    return jnp.take_along_axis(depth_planes_bd,
                               idx.reshape(idx.shape[0], -1),
                               axis=1).reshape(idx.shape)
