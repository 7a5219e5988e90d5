"""Training losses (pure JAX, mask-based instead of masked_select).

The loss cocktail matches the reference (`losses.py`,
`experiment_modules/depth_model.py:409-500`):

    loss = ms_loss + 1.0 * grad_loss + 1.0 * normals_loss + 0.2 * mv_loss

plus reported-but-not-backpropped terms (scale-invariant, abs L1,
inverse-depth L1, log L1). Dynamic-shape `masked_select` reductions become
masked sums with explicit counts, which is numerically identical for the
means involved and keeps everything jit-compatible with static shapes.

All depth maps here are (b, h, w); normals are (b, h, w, 3).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from simplerecon_tpu.ops import geometry as geo
from simplerecon_tpu.ops import image as image_ops
from simplerecon_tpu.ops.sampling import (resize_nearest,
                                          sample_nearest_matmul)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray,
                eps: float = 1e-10) -> jnp.ndarray:
    """Mean of `values` where `mask`, safe when the mask is empty."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), eps)


def scale_invariant_loss(log_depth_gt, log_depth_pred, mask,
                         si_lambda: float = 0.85):
    """Eigen scale-invariant loss (`losses.py:39-54`), over masked pixels."""
    diff = jnp.where(mask, log_depth_gt - log_depth_pred, 0.0)
    count = jnp.maximum(jnp.sum(mask.astype(diff.dtype)), 1e-10)
    mean_sq = jnp.sum(diff ** 2) / count
    mean = jnp.sum(diff) / count
    # clamped at 0: mean_sq >= mean^2 mathematically, but XLA fusion can
    # evaluate the difference to -epsilon (same failure mode as
    # geo.pose_distance)
    return jnp.sqrt(jnp.maximum(mean_sq - si_lambda * mean ** 2, 0.0))


def ms_gradient_loss(depth_gt_bhw, depth_pred_bhw, num_scales: int = 4):
    """Multi-scale gradient (Eq. 3): L1 between Sobel gradients over a
    blur-pool pyramid, masked where GT gradients are finite
    (`losses.py:11-37`)."""
    gt_pyr = image_ops.pyrdown(depth_gt_bhw[..., None], num_scales)
    pred_pyr = image_ops.pyrdown(depth_pred_bhw[..., None], num_scales)
    loss = 0.0
    for gt, pred in zip(gt_pyr, pred_pyr):
        gt_grad = image_ops.spatial_gradient(gt)      # (b,h,w,1,2)
        pred_grad = image_ops.spatial_gradient(pred)
        finite = jnp.all(jnp.isfinite(gt_grad), axis=-1, keepdims=True)
        gt_grad = jnp.where(finite, gt_grad, 0.0)
        err = jnp.abs(pred_grad - gt_grad)
        loss = loss + masked_mean(err, jnp.broadcast_to(finite, err.shape))
    return loss


def normals_loss(normals_gt_bhw3, normals_pred_bhw3):
    """0.5 * (1 - n_gt . n_pred) over pixels where both are finite
    (`losses.py:57-77`); the dot runs in fp32."""
    finite = (jnp.all(jnp.isfinite(normals_gt_bhw3), axis=-1)
              & jnp.all(jnp.isfinite(normals_pred_bhw3), axis=-1))
    gt = jnp.where(finite[..., None], normals_gt_bhw3, 1.0).astype(jnp.float32)
    pred = jnp.where(finite[..., None], normals_pred_bhw3, 1.0
                     ).astype(jnp.float32)
    dots = 0.5 * (1.0 - jnp.sum(gt * pred, axis=-1))
    return masked_mean(dots, finite)


def mv_depth_loss(depth_pred_bhw, cur_depth_bhw, src_depth_bkhw,
                  cur_invK_b44, src_K_bk44, cur_world_T_cam_b44,
                  src_cam_T_world_bk44):
    """Multi-view depth regression loss (Eq. 5, `losses.py:79-208`).

    For each source view: forward-project the predicted depth and compare
    (in log space) against the source GT depth sampled at the projected
    location, where the GT geometry passes an occlusion test
    (proj < 1.05 * sampled).
    """
    b, h, w = depth_pred_bhw.shape
    k = src_depth_bkhw.shape[1]

    def project_depths(depth_bhw, src_K_b44, src_cam_T_world_b44):
        pts = geo.backproject_depth(depth_bhw.astype(jnp.float32),
                                    cur_invK_b44.astype(jnp.float32))
        world = geo.transform_points(
            cur_world_T_cam_b44.astype(jnp.float32), pts)
        uvz = geo.project_points(world, src_K_b44.astype(jnp.float32),
                                 src_cam_T_world_b44.astype(jnp.float32))
        return uvz[..., :2], uvz[..., 2]  # pixel coords, proj depth

    total = 0.0
    for i in range(k):
        src_K = src_K_bk44[:, i]
        src_E = src_cam_T_world_bk44[:, i]
        # occlusion/validity from GT depth
        uv_gt, proj_gt = project_depths(cur_depth_bhw, src_K, src_E)
        scale = jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
        # one-hot matmul sampler: 7 views x h*w nearest GATHERS dominated
        # the loss cost on TPU (row-latency-bound); the matmul form is
        # exact-parity and runs on the MXU (see sample_nearest_matmul)
        sampled = sample_nearest_matmul(src_depth_bkhw[:, i][..., None],
                                        uv_gt * scale - 1.0)[..., 0]
        valid = ((proj_gt < 1.05 * sampled) & (proj_gt > 0) & (sampled > 0))

        _, proj_pred = project_depths(depth_pred_bhw, src_K, src_E)
        # clamp before the logs: even masked-out lanes must stay finite or
        # their NaNs leak through jnp.where in the backward pass
        diff = jnp.abs(jnp.log(jnp.maximum(sampled, 1e-6))
                       - jnp.log(jnp.maximum(proj_pred, 1e-6)))
        ok = valid & jnp.isfinite(diff)
        total = total + masked_mean(jnp.where(ok, diff, 0.0), ok)
    return total / k


def compute_losses(cur_data: Dict[str, jnp.ndarray],
                   src_data: Dict[str, jnp.ndarray],
                   outputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Full loss dictionary (`experiment_modules/depth_model.py:409-500`).

    Expects in `cur_data`: depth_bhw, mask_b_bhw (boolean valid mask),
    normals_bhw3, invK_s0_b44, world_T_cam_b44; in `src_data`: depth_bkhw,
    K_s0_bk44, cam_T_world_bk44; in `outputs`: depth_pred_s{i}_bhw1 /
    log variants and normals_pred_bhw3.
    """
    depth_gt = cur_data["depth_bhw"]
    mask_b = cur_data["mask_b_bhw"]
    depth_pred = outputs["depth_pred_s0_bhw1"][..., 0].astype(jnp.float32)
    log_depth_pred = outputs["log_depth_pred_s0_bhw1"][..., 0
                                                       ].astype(jnp.float32)
    log_depth_gt = jnp.log(depth_gt)
    safe_log_gt = jnp.where(mask_b, log_depth_gt, 0.0)

    h, w = depth_gt.shape[-2:]
    ms_loss = 0.0
    for i in range(4):
        key = f"log_depth_pred_s{i}_bhw1"
        if key not in outputs:
            continue
        pred_i = resize_nearest(outputs[key].astype(jnp.float32), h, w)[..., 0]
        ms_loss = ms_loss + masked_mean(
            jnp.abs(jnp.where(mask_b, log_depth_gt - pred_i, 0.0)), mask_b
        ) / (2 ** i)

    # The gradient loss must see NaN (not zero) outside the valid mask:
    # the blur-pool pyramid dilates the NaN region at each scale and the
    # finite-mask in ms_gradient_loss then excludes every pixel whose
    # gradient touched invalid GT — matching the reference
    # (`/root/reference/losses.py:26-36`), which propagates NaN through
    # pyrdown instead of training against artificial zero-edges.
    depth_gt_nan = jnp.where(mask_b, depth_gt, jnp.nan)
    grad_loss = ms_gradient_loss(depth_gt_nan, depth_pred)
    # Other consumers (mv_loss projection) need finite values instead.
    depth_gt_clean = jnp.where(mask_b, depth_gt, 0.0)
    abs_loss = masked_mean(jnp.abs(jnp.where(mask_b, depth_gt - depth_pred,
                                             0.0)), mask_b)
    si_loss = scale_invariant_loss(safe_log_gt, log_depth_pred, mask_b)

    mask_b_limit = mask_b & (depth_pred > 0.1)
    inv_abs = jnp.where(mask_b_limit,
                        1.0 / jnp.where(mask_b, depth_gt, 1.0)
                        - 1.0 / jnp.maximum(depth_pred, 1e-6), 0.0)
    inv_abs_loss = masked_mean(jnp.abs(inv_abs), mask_b_limit)
    log_l1_loss = masked_mean(
        jnp.abs(jnp.where(mask_b, log_depth_gt - log_depth_pred, 0.0)), mask_b)

    nrm_loss = normals_loss(cur_data["normals_bhw3"],
                            outputs["normals_pred_bhw3"])

    mv_loss = mv_depth_loss(
        depth_pred_bhw=depth_pred,
        cur_depth_bhw=depth_gt_clean,
        src_depth_bkhw=jnp.nan_to_num(src_data["depth_bkhw"], nan=0.0),
        cur_invK_b44=cur_data["invK_s0_b44"],
        src_K_bk44=src_data["K_s0_bk44"],
        cur_world_T_cam_b44=cur_data["world_T_cam_b44"],
        src_cam_T_world_bk44=src_data["cam_T_world_bk44"])

    loss = ms_loss + 1.0 * grad_loss + 1.0 * nrm_loss + 0.2 * mv_loss
    return {
        "loss": loss,
        "si_loss": si_loss,
        "grad_loss": grad_loss,
        "abs_loss": abs_loss,
        "normals_loss": nrm_loss,
        "ms_loss": ms_loss,
        "inv_abs_loss": inv_abs_loss,
        "log_l1_loss": log_l1_loss,
        "mv_loss": mv_loss,
    }
