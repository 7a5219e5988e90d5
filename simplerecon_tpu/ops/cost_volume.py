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
    """
    c0 = jnp.floor(coord)
    w1 = (coord - c0)
    w0 = 1.0 - w1
    i0 = c0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i1 >= 0) & (i1 < size)
    iota = jax.lax.broadcasted_iota(jnp.int32, coord.shape + (size,),
                                    coord.ndim)
    hit0 = (iota == jnp.clip(i0, 0, size - 1)[..., None]) & v0[..., None]
    hit1 = (iota == jnp.clip(i1, 0, size - 1)[..., None]) & v1[..., None]
    return (hit0 * w0[..., None] + hit1 * w1[..., None]).astype(dtype)


def sweep_warp_matmul(src_feats_bkhwc: jnp.ndarray,
                      src_extrinsics_bk44: jnp.ndarray,
                      src_Ks_bk44: jnp.ndarray,
                      cur_invK_b44: jnp.ndarray,
                      depth_planes_bd: jnp.ndarray,
                      row_chunk: Optional[int] = None) -> SweepWarp:
    """`sweep_warp` with the bilinear gather recast as MXU matmuls.

    TPU gathers are row-latency-bound: the 4-tap grid_sample warp of the
    hero model measures ~200 ms (98% of the forward) for ~22M 32-byte
    rows. Instead, exact bilinear sampling is computed as two separable
    "two-hot" contractions: a (rows, h) x (h, w*c) matmul interpolates
    in y, then a weighted reduce over w interpolates in x. That is
    ~2.2 TFLOP of dense MXU work in place of the gathers — an order of
    magnitude faster on this hardware, numerically identical (same tap
    weights, zeros padding).

    The sample rows are processed in `row_chunk`-sized pieces under
    `lax.scan` so the (rows, w*c) intermediate never exceeds ~100 MB.
    """
    b, k, h, w, c = src_feats_bkhwc.shape
    d = depth_planes_bd.shape[1]
    n = h * w
    dtype = src_feats_bkhwc.dtype

    grid_N3 = geo.pixel_grid(h, w)
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3,
                          cur_invK_b44[:, :3, :3].astype(jnp.float32))
    world_bdN3 = rays_bN3[:, None] * depth_planes_bd[..., None, None]

    uvz_bkdN3 = geo.project_points(
        world_bdN3[:, None],
        src_Ks_bk44[:, :, None].astype(jnp.float32),
        src_extrinsics_bk44[:, :, None].astype(jnp.float32))
    pix_bkdN2 = uvz_bkdN3[..., :2]
    depths_bkdN = uvz_bkdN3[..., 2]

    # index-space sample coords (half-pixel convention: centers at i+0.5)
    x = pix_bkdN2[..., 0].reshape(b, k, d * n) - 0.5
    y = pix_bkdN2[..., 1].reshape(b, k, d * n) - 0.5

    rows_total = d * n
    if row_chunk is None:
        # keep the scan body's f32 (b, k, r, w*c) intermediate near
        # ~100 MB so XLA can fuse it; larger blocks stop fusing and the
        # sweep becomes HBM-bandwidth-bound (measured 3x slower at b8)
        target = (100 << 20) // max(1, b * k * w * c * 4)
        row_chunk = max(256, min(4096, target))
    chunk = min(row_chunk, rows_total)
    while rows_total % chunk != 0:
        chunk -= 1
    n_chunks = rows_total // chunk

    img_bkhW = src_feats_bkhwc.reshape(b, k, h, w * c)

    def step(_, xy):
        x_c, y_c = xy  # (b, k, chunk)
        ohy = _twohot(y_c, h, dtype)                    # (b, k, r, h)
        rows = jnp.einsum("bkrh,bkhW->bkrW", ohy, img_bkhW,
                          preferred_element_type=jnp.float32)
        rows = rows.reshape(b, k, chunk, w, c)
        ohx = _twohot(x_c, w, jnp.float32)              # (b, k, r, w)
        out = jnp.einsum("bkrw,bkrwc->bkrc", ohx, rows)
        return None, out.astype(dtype)

    xs = (x.reshape(b, k, n_chunks, chunk).transpose(2, 0, 1, 3),
          y.reshape(b, k, n_chunks, chunk).transpose(2, 0, 1, 3))
    _, outs = jax.lax.scan(step, None, xs)
    sampled = outs.transpose(1, 2, 0, 3, 4).reshape(b, k, d, n, c)

    mask_bkdN = (depths_bkdN > 0).astype(dtype)
    return SweepWarp(world_bdN3, sampled, depths_bkdN, mask_bkdN,
                     pix_bkdN2)


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
