"""Camera geometry kernels as pure JAX functions.

Numerics mirror the reference's `utils/geometry_utils.py` exactly:

  * pixel centers are offset by +0.5 (`utils/geometry_utils.py:34-39`)
  * homogeneous divide is the Kornia/OpenCV "safe" divide with an eps mask
    (`utils/geometry_utils.py:62-89` — the reference's bug-fix #3)
  * `pose_distance` is the DVMVS metric sqrt(||t||^2 + R_measure^2)
    (`utils/geometry_utils.py:178-191`)

Layout conventions (TPU-native, differs from the torch reference):
  * point sets are (..., N, 3) "points-last" so transforms are plain matmuls
    that XLA tiles onto the MXU
  * depth maps are (b, h, w); images/features are NHWC
  * 4x4 matrices act on column vectors exactly as in the reference; with
    points-last storage that means `pts @ M[:3,:3].T + M[:3,3]`.

All functions are jit-safe (static shapes, no Python branching on values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# pixel grids / backprojection
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _pixel_grid_np(height: int, width: int) -> np.ndarray:
    """Homogeneous pixel-center grid, shape (h*w, 3), row-major over (y, x).

    Matches the reference's `BackprojectDepth` buffer
    (`utils/geometry_utils.py:34-48`): coordinates are (x+0.5, y+0.5, 1).
    """
    xs = np.arange(width, dtype=np.float32) + 0.5
    ys = np.arange(height, dtype=np.float32) + 0.5
    xx, yy = np.meshgrid(xs, ys)  # (h, w) each
    grid = np.stack([xx, yy, np.ones_like(xx)], axis=-1)  # (h, w, 3)
    return grid.reshape(height * width, 3)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h*w, 3) homogeneous pixel centers with the +0.5 offset."""
    return jnp.asarray(_pixel_grid_np(height, width), dtype=dtype)


def backproject_depth(depth_bhw: jnp.ndarray, invK_b44: jnp.ndarray
                      ) -> jnp.ndarray:
    """Backprojects a depth map into camera-frame 3D points.

    Equivalent to the reference `BackprojectDepth.forward`
    (`utils/geometry_utils.py:50-59`) minus the homogeneous 1s row (append
    with `to_homogeneous` if needed).

    Args:
        depth_bhw: (b, h, w) depths.
        invK_b44: (b, 4, 4) inverse intrinsics (only the 3x3 block is used).

    Returns:
        (b, h*w, 3) camera-frame points, N ordered row-major over (y, x).
    """
    b, h, w = depth_bhw.shape
    grid_N3 = pixel_grid(h, w, dtype=depth_bhw.dtype)
    # rays = invK[:3,:3] @ pix  ->  points-last: pix @ invK[:3,:3]^T
    rays_bN3 = jnp.einsum("nj,bij->bni", grid_N3, invK_b44[:, :3, :3])
    return rays_bN3 * depth_bhw.reshape(b, h * w, 1)


def to_homogeneous(points_bN3: jnp.ndarray) -> jnp.ndarray:
    """Appends a column of ones: (..., N, 3) -> (..., N, 4)."""
    ones = jnp.ones_like(points_bN3[..., :1])
    return jnp.concatenate([points_bN3, ones], axis=-1)


def transform_points(M_b44: jnp.ndarray, points_bN3: jnp.ndarray
                     ) -> jnp.ndarray:
    """Applies a rigid/affine 4x4 transform to (..., N, 3) points."""
    return (jnp.einsum("...nj,...ij->...ni", points_bN3, M_b44[..., :3, :3])
            + M_b44[..., None, :3, 3])


def project_points(points_bN3: jnp.ndarray, K_b44: jnp.ndarray,
                   cam_T_world_b44: jnp.ndarray, eps: float = 1e-8
                   ) -> jnp.ndarray:
    """Projects world points into a camera with a safe homogeneous divide.

    Mirrors the reference `Project3D.forward` (`utils/geometry_utils.py:72-89`)
    bit-for-bit in fp32: P = K @ cam_T_world; z' = z + eps; pixels are scaled
    by 1/z' only where |z| > eps (else left unscaled), and the returned depth
    channel is z' = z + eps.

    Args:
        points_bN3: (..., N, 3) world points.
        K_b44, cam_T_world_b44: (..., 4, 4).

    Returns:
        (..., N, 3): (u, v, z+eps) — u, v in *pixel* units.
    """
    P = jnp.matmul(K_b44, cam_T_world_b44)
    cam_bN3 = (jnp.einsum("...nj,...ij->...ni", points_bN3, P[..., :3, :3])
               + P[..., None, :3, 3])
    z = cam_bN3[..., 2:3]
    mask = jnp.abs(z) > eps
    z_eps = z + eps
    scale = jnp.where(mask, 1.0 / z_eps, jnp.ones_like(z_eps))
    uv = cam_bN3[..., :2] * scale
    return jnp.concatenate([uv, z_eps], axis=-1)


# --------------------------------------------------------------------------
# rays / pose metrics
# --------------------------------------------------------------------------

def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12
              ) -> jnp.ndarray:
    """L2-normalize matching torch.nn.functional.normalize semantics:
    v / max(||v||, eps). The norm is computed with a tiny additive term so
    its gradient stays finite at v = 0 (jnp.linalg.norm has a NaN gradient
    there); the value is unchanged because the eps clamp dominates."""
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + 1e-30)
    return v / jnp.maximum(n, eps)


def get_camera_rays(world_T_cam_b44: jnp.ndarray,
                    world_points_bN3: jnp.ndarray) -> jnp.ndarray:
    """Unit rays from a camera origin to world points (world frame).

    The reference's `get_camera_rays(..., in_camera_frame=False)` path
    (`utils/geometry_utils.py:169-175`).
    """
    origins = world_T_cam_b44[..., None, :3, 3]
    return normalize(world_points_bN3 - origins, axis=-1)


def pose_distance(pose_b44: jnp.ndarray):
    """DVMVS pose-distance measure (`utils/geometry_utils.py:178-191`).

    Returns (combined, R_measure, t_measure), each shaped like the batch.
    """
    R_trace = jnp.trace(pose_b44[..., :3, :3], axis1=-2, axis2=-1)
    # clamp at 0: XLA reassociation can evaluate the bracket to -epsilon
    # for identity rotations (trace == 3), and sqrt(-eps) poisons the
    # whole cost volume with NaNs under jit
    R_measure = jnp.sqrt(jnp.maximum(
        2.0 * (1.0 - jnp.minimum(3.0, R_trace) / 3.0), 0.0))
    t_measure = jnp.linalg.norm(pose_b44[..., :3, 3], axis=-1)
    combined = jnp.sqrt(t_measure ** 2 + R_measure ** 2)
    return combined, R_measure, t_measure


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1,
                      eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.functional.cosine_similarity semantics: each norm is clamped
    to a minimum of eps before the divide."""
    dot = jnp.sum(a * b, axis=axis)
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return dot / (na * nb)


# --------------------------------------------------------------------------
# normals from depth
# --------------------------------------------------------------------------

def normals_from_depth(depth_bhw: jnp.ndarray, invK_b44: jnp.ndarray,
                       smoothing_kernel_size: int = 5,
                       smoothing_kernel_std: float = 2.0) -> jnp.ndarray:
    """Estimates per-pixel normals from a depth map.

    Pipeline mirrors the reference `NormalGenerator`
    (`utils/geometry_utils.py:92-133`): gaussian blur -> backproject ->
    spatial (Sobel) gradients of the 3D point map -> cross product ->
    L2-normalize.

    Returns:
        (b, h, w, 3) unit normals.
    """
    from simplerecon_tpu.ops import image as image_ops

    b, h, w = depth_bhw.shape
    depth_smooth = image_ops.gaussian_blur(
        depth_bhw[..., None], kernel_size=smoothing_kernel_size,
        sigma=smoothing_kernel_std)[..., 0]
    points_bN3 = backproject_depth(depth_smooth, invK_b44)
    points_bhw3 = points_bN3.reshape(b, h, w, 3)
    # (b, h, w, 3, 2): gradients (dx, dy) of each coordinate channel
    grads = image_ops.spatial_gradient(points_bhw3)
    normals = jnp.cross(grads[..., 0], grads[..., 1])
    return normalize(normals, axis=-1)


# --------------------------------------------------------------------------
# small numpy helpers (host-side pose wrangling)
# --------------------------------------------------------------------------

def qvec2rotmat(qvec) -> np.ndarray:
    """Quaternion (w, x, y, z) to 3x3 rotation matrix
    (`utils/geometry_utils.py:193-211`)."""
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y ** 2 - 2 * z ** 2, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x ** 2 - 2 * z ** 2, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x ** 2 - 2 * y ** 2],
    ])


def rotx(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
