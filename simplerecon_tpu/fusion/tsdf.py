"""TSDF volume + depth integration (pure JAX, jit-compiled).

Re-designs `tools/tsdf.py` for TPU: the volume is a dense voxel grid held
as JAX arrays; `integrate_depth` projects ALL voxels into the camera in
one shot, nearest-samples the depth map, and applies the InfiniTAM-style
weighted update — a single fused XLA program with no host round-trips
(the reference loops per batch element on GPU, `tools/tsdf.py:238-320`).

Semantics mirrored from the reference:
  * dims rounded up to multiples of 8 (`VOX_MOD`, `tools/tsdf.py:17`);
  * bounds from GT mesh extents + 3 voxels or a fixed box
    (`TSDF.from_mesh/from_bounds`, `tools/tsdf.py:69-123`);
  * truncation = 3 voxels; InfiniTAM confidence
    `(1 - (d - dmin)/(dmax - dmin))^2`, adaptive update rate (2 or 5),
    max weight 100 (`tools/tsdf.py:263-320`);
  * values stored half precision (bf16 on TPU), weights fp16-equivalent.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

VOX_MOD = 8


def _round_up(x: int, mod: int = VOX_MOD) -> int:
    return int(-(-x // mod) * mod)


@dataclass
class TSDF:
    """A dense TSDF voxel grid.

    `values` in [-1, 1] (truncated, normalized SDF), `weights` >= 0.
    `origin` is the world-space coordinate of voxel (0, 0, 0).
    """
    values: jnp.ndarray           # (X, Y, Z)
    weights: jnp.ndarray          # (X, Y, Z)
    origin: np.ndarray            # (3,)
    voxel_size: float
    colors: Optional[jnp.ndarray] = None  # (X, Y, Z, 3) optional

    @classmethod
    def from_bounds(cls, bounds_3x2, voxel_size: float,
                    store_dtype=jnp.bfloat16, with_color: bool = False
                    ) -> "TSDF":
        """`bounds_3x2[i] = (min_i, max_i)` in meters
        (`tools/tsdf.py:96-123`)."""
        bounds = np.asarray(bounds_3x2, np.float64)
        extents = bounds[:, 1] - bounds[:, 0]
        dims = [_round_up(int(np.ceil(e / voxel_size))) for e in extents]
        values = jnp.ones(dims, store_dtype)
        weights = jnp.zeros(dims, store_dtype)
        colors = (jnp.zeros(tuple(dims) + (3,), store_dtype)
                  if with_color else None)
        return cls(values=values, weights=weights,
                   origin=bounds[:, 0].astype(np.float32),
                   voxel_size=float(voxel_size), colors=colors)

    @classmethod
    def from_mesh(cls, vertices_n3, voxel_size: float, **kw) -> "TSDF":
        """Bounds from mesh extents padded by 3 voxels
        (`tools/tsdf.py:69-94`)."""
        v = np.asarray(vertices_n3, np.float64)
        pad = 3 * voxel_size
        bounds = np.stack([v.min(0) - pad, v.max(0) + pad], axis=1)
        return cls.from_bounds(bounds, voxel_size, **kw)

    @property
    def dims(self) -> Tuple[int, int, int]:
        return tuple(self.values.shape)

    def voxel_coords_world(self) -> jnp.ndarray:
        """(N, 3) world-space voxel centers, N = X*Y*Z (fp32)."""
        X, Y, Z = self.dims
        ix, iy, iz = jnp.meshgrid(jnp.arange(X), jnp.arange(Y),
                                  jnp.arange(Z), indexing="ij")
        grid = jnp.stack([ix, iy, iz], axis=-1).reshape(-1, 3)
        return (grid.astype(jnp.float32) * self.voxel_size
                + jnp.asarray(self.origin))

    def to_numpy(self) -> Tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.values, np.float32),
                np.asarray(self.weights, np.float32))

    def to_mesh(self, scale_to_world: bool = True,
                return_colors: bool = False):
        """Extracts the zero isosurface with the native marching-cubes
        kernel. Returns (vertices (V,3) fp32, faces (F,3) int32) and,
        when `return_colors`, per-vertex colors (V,3) fp32 in [0,1]
        trilinearly sampled from the color grid (None if the volume has
        no colors)."""
        from simplerecon_tpu.fusion import mesh as mesh_lib
        values, weights = self.to_numpy()
        # unobserved voxels must not generate geometry
        masked = np.where(weights > 0, values, np.nan)
        verts, faces = mesh_lib.marching_cubes(masked, level=0.0)
        vert_colors = None
        if return_colors and self.colors is not None:
            grid = np.asarray(self.colors, np.float32)   # (X, Y, Z, 3)
            vert_colors = _trilinear_sample(grid, verts)
        if scale_to_world:
            verts = verts * self.voxel_size + self.origin[None]
        verts = verts.astype(np.float32)
        if return_colors:
            return verts, faces, vert_colors
        return verts, faces


def _trilinear_sample(grid_xyz3: np.ndarray, pts_v3: np.ndarray
                      ) -> np.ndarray:
    """Trilinear interpolation of a (X, Y, Z, C) grid at (V, 3) points in
    voxel coordinates (host-side numpy, used for mesh vertex colors)."""
    dims = np.asarray(grid_xyz3.shape[:3])
    p = np.clip(pts_v3, 0.0, (dims - 1).astype(np.float64) - 1e-6)
    p0 = np.floor(p).astype(np.int64)
    f = (p - p0).astype(np.float32)
    out = np.zeros((len(pts_v3), grid_xyz3.shape[-1]), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wx = f[:, 0] if dx else 1.0 - f[:, 0]
                wy = f[:, 1] if dy else 1.0 - f[:, 1]
                wz = f[:, 2] if dz else 1.0 - f[:, 2]
                ix = np.minimum(p0[:, 0] + dx, dims[0] - 1)
                iy = np.minimum(p0[:, 1] + dy, dims[1] - 1)
                iz = np.minimum(p0[:, 2] + dz, dims[2] - 1)
                out += (wx * wy * wz)[:, None] * grid_xyz3[ix, iy, iz]
    return out


def _projective_update(values, weights, world_coords_N3, depth_hw,
                       cam_T_world_44, K_44, truncation, min_depth_m,
                       max_depth: float, max_weight: float):
    """Shared projective-TSDF math: returns the fused values/weights plus
    the per-voxel sample indices and new-sample weights, so a color
    variant can reuse them. Mirrors `tools/tsdf.py:238-320`."""
    h, w = depth_hw.shape
    shape = values.shape

    # project voxel centers into the camera (`tools/tsdf.py:221-236`)
    cam = (cam_T_world_44[:3, :3] @ world_coords_N3.T
           + cam_T_world_44[:3, 3:4])                    # (3, N)
    pix = K_44[:3, :3] @ cam
    z = pix[2]
    u = pix[0] / jnp.where(z == 0, 1e-8, z)
    v = pix[1] / jnp.where(z == 0, 1e-8, z)

    # nearest-neighbor depth lookup (reference uses nearest grid_sample)
    ui = jnp.round(u - 0.5).astype(jnp.int32)
    vi = jnp.round(v - 0.5).astype(jnp.int32)
    inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z > 0)
    ui_c = jnp.clip(ui, 0, w - 1)
    vi_c = jnp.clip(vi, 0, h - 1)
    sampled = depth_hw[vi_c, ui_c]

    valid_depth = (sampled > min_depth_m) & (sampled < max_depth) \
        & jnp.isfinite(sampled)
    sdf = sampled - z                                     # meters
    valid = inside & valid_depth & (sdf > -truncation)

    tsdf_new = jnp.clip(sdf / truncation, -1.0, 1.0)

    # InfiniTAM-style confidence + adaptive update rate
    # (`tools/tsdf.py:276-300`)
    conf = (1.0 - jnp.clip((sampled - min_depth_m)
                           / (max_depth - min_depth_m), 0.0, 1.0)) ** 2
    update_rate = jnp.where(conf < 0.5, 2.0, 5.0)
    w_new = jnp.where(valid, update_rate * conf, 0.0)

    old_v = values.reshape(-1).astype(jnp.float32)
    old_w = weights.reshape(-1).astype(jnp.float32)
    denom = old_w + w_new
    fused = jnp.where(denom > 0,
                      (old_v * old_w + tsdf_new * w_new)
                      / jnp.where(denom > 0, denom, 1.0),
                      old_v)
    new_w = jnp.minimum(denom, max_weight)
    return (fused.reshape(shape).astype(values.dtype),
            new_w.reshape(shape).astype(weights.dtype),
            ui_c, vi_c, w_new, old_w, denom)


@functools.partial(jax.jit, static_argnames=("max_depth", "max_weight"))
def _integrate_one(values, weights, world_coords_N3, depth_hw,
                   cam_T_world_44, K_44, truncation, min_depth_m,
                   max_depth: float = 3.0, max_weight: float = 100.0):
    """One depth map into the volume. All voxels processed in parallel."""
    fused, new_w, *_ = _projective_update(
        values, weights, world_coords_N3, depth_hw, cam_T_world_44, K_44,
        truncation, min_depth_m, max_depth, max_weight)
    return fused, new_w


@functools.partial(jax.jit, static_argnames=("max_depth", "max_weight"))
def _integrate_one_color(values, weights, colors, world_coords_N3,
                         depth_hw, color_3hw, cam_T_world_44, K_44,
                         truncation, min_depth_m, max_depth: float = 3.0,
                         max_weight: float = 100.0):
    """Depth + RGB integration: the color grid gets the same weighted
    running-mean update as the TSDF values, sampled at the same pixel —
    the capability the reference gets from Open3D's color TSDF
    (`tools/fusers_helper.py:125-186`)."""
    fused, new_w, ui_c, vi_c, w_new, old_w, denom = _projective_update(
        values, weights, world_coords_N3, depth_hw, cam_T_world_44, K_44,
        truncation, min_depth_m, max_depth, max_weight)
    c_new = color_3hw[:, vi_c, ui_c].T.astype(jnp.float32)   # (N, 3)
    old_c = colors.reshape(-1, 3).astype(jnp.float32)
    fused_c = jnp.where(denom[:, None] > 0,
                        (old_c * old_w[:, None] + c_new * w_new[:, None])
                        / jnp.where(denom[:, None] > 0, denom[:, None], 1.0),
                        old_c)
    return fused, new_w, fused_c.reshape(colors.shape).astype(colors.dtype)


class TSDFFuser:
    """Depth-map fuser over a `TSDF` (`tools/tsdf.py:171-320`)."""

    def __init__(self, tsdf: TSDF, min_depth: float = 0.5,
                 max_depth: float = 3.0, use_gt_depth: bool = False):
        self.tsdf = tsdf
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        self.use_gt_depth = use_gt_depth
        self.truncation = 3.0 * tsdf.voxel_size
        # voxel centers are precomputed once and live on device
        self._coords = self.tsdf.voxel_coords_world()

    def integrate_depth(self, depth_b1hw, cam_T_world_b44, K_b44,
                        color_b3hw=None):
        """Integrates a batch of depth maps sequentially (the volume update
        is order-dependent, as in the reference). When the volume carries
        a color grid and `color_b3hw` ([0,1] RGB) is given, colors are
        fused with the same weights."""
        depth = jnp.asarray(depth_b1hw)
        if depth.ndim == 4:
            depth = depth[:, 0]
        cam_T_world_b44 = jnp.asarray(cam_T_world_b44, jnp.float32)
        K_b44 = jnp.asarray(K_b44, jnp.float32)
        with_color = color_b3hw is not None and self.tsdf.colors is not None
        if with_color:
            color_b3hw = jnp.asarray(color_b3hw, jnp.float32)
        values, weights = self.tsdf.values, self.tsdf.weights
        colors = self.tsdf.colors
        for i in range(depth.shape[0]):
            if with_color:
                values, weights, colors = self._integrate_color_chunked(
                    values, weights, colors, depth[i].astype(jnp.float32),
                    color_b3hw[i], cam_T_world_b44[i], K_b44[i])
            else:
                values, weights = _integrate_one(
                    values, weights, self._coords,
                    depth[i].astype(jnp.float32),
                    cam_T_world_b44[i], K_b44[i],
                    jnp.float32(self.truncation),
                    jnp.float32(self.min_depth), max_depth=self.max_depth)
        self.tsdf.values, self.tsdf.weights = values, weights
        if with_color:
            self.tsdf.colors = colors
        return self.tsdf

    # at most ~2M voxels per jitted color-integrate call: the f32
    # (N, 3) temporaries of the color update OOM HBM on large volumes
    # (observed: 20 GB requested on a 251^3 fallback-box grid)
    _COLOR_CHUNK_VOXELS = 2 * 1024 * 1024

    def _integrate_color_chunked(self, values, weights, colors, depth_hw,
                                 color_3hw, cam_T_world_44, K_44):
        X, Y, Z = values.shape
        n = X * Y * Z
        coords = self._coords.reshape(X, Y, Z, 3)
        # equal-size chunks along X (one compile, many calls)
        xc = 1
        for cand in range(X, 0, -1):
            if X % cand == 0 and cand * Y * Z <= self._COLOR_CHUNK_VOXELS:
                xc = cand
                break
        out_v, out_w, out_c = [], [], []
        for x0 in range(0, X, xc):
            v, w_, c = _integrate_one_color(
                values[x0:x0 + xc], weights[x0:x0 + xc],
                colors[x0:x0 + xc],
                coords[x0:x0 + xc].reshape(-1, 3),
                depth_hw, color_3hw, cam_T_world_44, K_44,
                jnp.float32(self.truncation), jnp.float32(self.min_depth),
                max_depth=self.max_depth)
            out_v.append(v)
            out_w.append(w_)
            out_c.append(c)
        del n
        return (jnp.concatenate(out_v, axis=0),
                jnp.concatenate(out_w, axis=0),
                jnp.concatenate(out_c, axis=0))
