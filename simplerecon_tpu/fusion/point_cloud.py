"""Multi-view-consistency point-cloud fusion (3DVNet style, pure JAX).

Re-designs `tools/torch_point_cloud_fusion.py:12-118`: for each reference
frame, backproject its depth map to world points, reproject those points
into every other frame, and keep points whose reprojected depth agrees
with the sampled depth (|z_proj - z_sampled| < z_thresh) in at least
`n_consistent` views; consistent samples are averaged and the cloud is
voxel-downsampled.

TPU formulation: the per-frame consistency test is one jitted program
over all frames at once (the reference chunks python-side, 100 frames at
a time); voxel downsampling runs host-side in numpy (hash-bucket mean).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.ops import geometry as geo


@functools.partial(jax.jit, static_argnames=("z_thresh", "n_consistent"))
def _consistency_pass(depths_fhw, world_T_cam_f44, cam_T_world_f44,
                      K_f44, invK_f44, ref_index, z_thresh: float = 0.04,
                      n_consistent: int = 3):
    """Consistency test of one reference frame against all others.

    Returns (points_N3 in world space, colors placeholder, keep_N bool,
    fused_z over consistent views).
    """
    f, h, w = depths_fhw.shape
    ref_depth = depths_fhw[ref_index]
    pts_cam = geo.backproject_depth(ref_depth[None],
                                    invK_f44[ref_index][None])[0]  # (N,3)
    pts_world = geo.transform_points(world_T_cam_f44[ref_index][None],
                                     pts_cam[None])[0]

    def per_view(world_T_cam_44, cam_T_world_44, K_44, invK_44, depth_hw):
        uvz = geo.project_points(pts_world[None], K_44[None],
                                 cam_T_world_44[None])[0]
        u, v, z = uvz[..., 0], uvz[..., 1], uvz[..., 2]
        ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, h - 1)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0)
        sampled = depth_hw[vi, ui]
        ok = inside & jnp.isfinite(sampled) & (sampled > 0) \
            & (jnp.abs(z - sampled) < z_thresh)
        # world-space point implied by the *sampled* source depth at the
        # reprojected pixel — these get averaged with the ref point,
        # matching `torch_point_cloud_fusion.py:72-91`
        z_s = jnp.where(ok, sampled, 0.0)
        pix_h = jnp.stack([u * z_s, v * z_s, z_s,
                           jnp.ones_like(z_s)], axis=-1)
        cam_pt = (invK_44 @ pix_h.T).T[..., :3]
        cam_pt = jnp.concatenate(
            [cam_pt, jnp.ones_like(cam_pt[..., :1])], axis=-1)
        world_pt = (world_T_cam_44 @ cam_pt.T).T[..., :3]
        finite = jnp.all(jnp.isfinite(world_pt), axis=-1)
        ok = ok & finite
        world_pt = jnp.where((ok & finite)[..., None], world_pt, 0.0)
        return ok, world_pt

    ok_fN, sample_fN3 = jax.vmap(per_view)(
        world_T_cam_f44, cam_T_world_f44, K_f44, invK_f44, depths_fhw)
    # drop the ref frame's trivial self-match from the consistency count
    # (the reference iterates src frames only, `torch_point_cloud_fusion.py:106-108`)
    not_ref = (jnp.arange(f) != ref_index)
    ok_fN = ok_fN & not_ref[:, None]
    count = jnp.sum(ok_fN.astype(jnp.int32), axis=0)
    keep = (count >= n_consistent) & jnp.isfinite(ref_depth.reshape(-1)) \
        & (ref_depth.reshape(-1) > 0)
    # average the consistent samples together with the ref point
    # (`torch_point_cloud_fusion.py:83-91`: pts_avg = (pts + sum) / (n+1))
    sums = jnp.sum(sample_fN3 * ok_fN[..., None], axis=0)
    pts_avg = (pts_world + sums) / (count[..., None].astype(jnp.float32)
                                    + 1.0)
    return pts_avg, keep, count


def voxel_downsample(points_N3: np.ndarray, voxel: float,
                     colors_N3: Optional[np.ndarray] = None
                     ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Mean position per occupied voxel (host-side numpy)."""
    if len(points_N3) == 0:
        return points_N3, colors_N3
    keys = np.floor(points_N3 / voxel).astype(np.int64)
    # dense hash of 3D integer keys
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((counts.shape[0], 3), np.float64)
    np.add.at(sums, inv, points_N3)
    out = (sums / counts[:, None]).astype(np.float32)
    out_colors = None
    if colors_N3 is not None:
        csums = np.zeros((counts.shape[0], 3), np.float64)
        np.add.at(csums, inv, colors_N3)
        out_colors = (csums / counts[:, None]).astype(np.float32)
    return out, out_colors


def process_scene(depths_fhw: np.ndarray, world_T_cam_f44: np.ndarray,
                  K_f44: np.ndarray, invK_f44: np.ndarray,
                  colors_f3hw: Optional[np.ndarray] = None,
                  z_thresh: float = 0.04, n_consistent: int = 3,
                  voxel_downsample_size: float = 0.02
                  ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Full-scene fusion (`torch_point_cloud_fusion.py:100-118`,
    `pc_fusion.py:158-172`). Depths <= 0 or NaN are ignored.

    Returns (points (M, 3) float32, colors (M, 3) float32 or None).
    """
    depths = jnp.asarray(np.nan_to_num(depths_fhw, nan=0.0), jnp.float32)
    w2c = jnp.asarray(np.stack([np.linalg.inv(p) for p in world_T_cam_f44]),
                      jnp.float32)
    c2w = jnp.asarray(world_T_cam_f44, jnp.float32)
    K = jnp.asarray(K_f44, jnp.float32)
    invK = jnp.asarray(invK_f44, jnp.float32)

    all_points, all_colors = [], []
    f = depths.shape[0]
    for ref in range(f):
        pts, keep, _ = _consistency_pass(
            depths, c2w, w2c, K, invK, ref,
            z_thresh=z_thresh, n_consistent=n_consistent)
        keep_np = np.asarray(keep)
        pts_np = np.asarray(pts)[keep_np]
        all_points.append(pts_np)
        if colors_f3hw is not None:
            cols = colors_f3hw[ref].reshape(3, -1).T[keep_np]
            all_colors.append(cols)

    points = np.concatenate(all_points, 0) if all_points else \
        np.zeros((0, 3), np.float32)
    colors = (np.concatenate(all_colors, 0)
              if colors_f3hw is not None and all_colors else None)
    return voxel_downsample(points, voxel_downsample_size, colors)
