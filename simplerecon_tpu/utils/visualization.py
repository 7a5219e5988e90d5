"""Visualization helpers (host-side numpy + PIL).

Counterpart of `utils/visualization_utils.py`: turbo-colormapped depth
(`colormap_image`, `:12-72`), percentile-robust depth normalization
(`utils/generic_utils.py:42-84`), and `quick_viz_export` PNG panels
(`:84-167`). Video assembly writes PNG frame sequences (+ mp4 via
cv2.VideoWriter when OpenCV is available — the reference used moviepy).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from simplerecon_tpu.data.io import reverse_imagenet_normalize_np

# Polynomial approximation of the Turbo colormap (Google, public),
# matching matplotlib's "turbo" to visual accuracy.
_TURBO_R = (0.13572138, 4.61539260, -42.66032258, 132.13108234,
            -152.94239396, 59.28637943)
_TURBO_G = (0.09140261, 2.19418839, 4.84296658, -14.18503333,
            4.27729857, 2.82956604)
_TURBO_B = (0.10667330, 12.64194608, -60.58204836, 110.36276771,
            -89.90310912, 27.34824973)


def _poly(x, coeffs):
    out = np.zeros_like(x)
    for c in reversed(coeffs):
        out = out * x + c
    return out


def turbo_colormap(x01: np.ndarray) -> np.ndarray:
    """Maps values in [0, 1] to RGB in [0, 1], shape (..., 3)."""
    x = np.clip(x01, 0.0, 1.0)
    rgb = np.stack([_poly(x, _TURBO_R), _poly(x, _TURBO_G),
                    _poly(x, _TURBO_B)], axis=-1)
    return np.clip(rgb, 0.0, 1.0)


def normalize_depth_robust(depth_hw: np.ndarray,
                           robust_percentile: float = 5.0,
                           mask: Optional[np.ndarray] = None):
    """Percentile-robust vmin/vmax (`utils/generic_utils.py:42-84`)."""
    vals = depth_hw[mask] if mask is not None else depth_hw
    vals = vals[np.isfinite(vals)]
    if vals.size == 0:
        return 0.0, 1.0
    vmin = float(np.percentile(vals, robust_percentile))
    vmax = float(np.percentile(vals, 100 - robust_percentile))
    if vmax <= vmin:
        vmax = vmin + 1e-6
    return vmin, vmax


def colormap_image(depth_hw: np.ndarray, vmin: Optional[float] = None,
                   vmax: Optional[float] = None,
                   invalid_color=(0.47, 0.47, 0.47)) -> np.ndarray:
    """Turbo-colormapped image (h, w, 3) in [0, 1]; NaN/inf pixels get
    `invalid_color` (`utils/visualization_utils.py:12-72`)."""
    finite = np.isfinite(depth_hw)
    if vmin is None or vmax is None:
        auto_min, auto_max = normalize_depth_robust(depth_hw)
        vmin = auto_min if vmin is None else vmin
        vmax = auto_max if vmax is None else vmax
    x = (np.where(finite, depth_hw, vmin) - vmin) / max(vmax - vmin, 1e-9)
    rgb = turbo_colormap(x)
    rgb[~finite] = invalid_color
    return rgb


def save_image(path: str, image01) -> str:
    arr = np.clip(np.asarray(image01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return path


def quick_viz_export(viz_path: str, outputs: Dict, cur_data: Dict,
                     batch_ind: int = 0, prefix: str = "") -> List[str]:
    """Dumps RGB / predicted depth / GT depth PNGs for one element
    (`utils/visualization_utils.py:84-167`)."""
    os.makedirs(viz_path, exist_ok=True)
    written = []

    image = np.asarray(cur_data["image_b3hw"][batch_ind])
    rgb = reverse_imagenet_normalize_np(image).transpose(1, 2, 0)
    written.append(save_image(
        os.path.join(viz_path, f"{prefix}color.png"), rgb))

    depth_pred = np.asarray(outputs["depth_pred_s0_bhw1"][batch_ind, ...,
                                                          0])
    gt = None
    if "full_res_depth_b1hw" in cur_data:
        gt = np.asarray(cur_data["full_res_depth_b1hw"][batch_ind, 0])
    elif "depth_b1hw" in cur_data:
        gt = np.asarray(cur_data["depth_b1hw"][batch_ind, 0])

    # shared vmin/vmax across pred and gt, as the reference does
    vmin, vmax = normalize_depth_robust(gt if gt is not None
                                        else depth_pred)
    written.append(save_image(
        os.path.join(viz_path, f"{prefix}depth_pred.png"),
        colormap_image(depth_pred, vmin, vmax)))
    if gt is not None:
        written.append(save_image(
            os.path.join(viz_path, f"{prefix}depth_gt.png"),
            colormap_image(gt, vmin, vmax)))

    if outputs.get("lowest_cost_bhw") is not None:
        lc = np.asarray(outputs["lowest_cost_bhw"][batch_ind])
        written.append(save_image(
            os.path.join(viz_path, f"{prefix}lowest_cost.png"),
            colormap_image(lc, vmin, vmax)))
    return written


def write_video(path: str, frames01: List[np.ndarray], fps: int = 30):
    """mp4 via OpenCV when present; falls back to a PNG sequence."""
    try:
        import cv2
        h, w = frames01[0].shape[:2]
        writer = cv2.VideoWriter(path,
                                 cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (w, h))
        for f in frames01:
            bgr = (np.clip(f, 0, 1)[..., ::-1] * 255).astype(np.uint8)
            writer.write(bgr)
        writer.release()
        return path
    except Exception:
        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        for i, f in enumerate(frames01):
            save_image(os.path.join(base, f"{i:06d}.png"), f)
        return base


def _resize_nearest_np(img_hwc: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize for host-side panel assembly."""
    sh, sw = img_hwc.shape[:2]
    ri = (np.arange(h) * sh // h).clip(0, sh - 1)
    ci = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img_hwc[ri][:, ci]


def _conv2_same_np(x_hw: np.ndarray, k: np.ndarray,
                   pad_mode: str) -> np.ndarray:
    """Tiny same-size 2D correlation for host-side viz (no scipy)."""
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x_hw, ((ph, ph), (pw, pw)),
                mode="reflect" if pad_mode == "reflect" else "edge")
    out = np.zeros_like(x_hw, dtype=np.float32)
    for i in range(kh):
        for j in range(kw):
            out += k[i, j] * xp[i:i + x_hw.shape[0], j:j + x_hw.shape[1]]
    return out


def normals_from_depth_np(depth_hw: np.ndarray, invK_44: np.ndarray,
                          kernel_size: int = 5,
                          sigma: float = 2.0) -> np.ndarray:
    """Host-side numpy mirror of `ops.geometry.normals_from_depth`
    (gaussian blur -> backproject (+0.5 centers) -> Sobel/8 gradients ->
    cross -> normalize), for visualization scripts that should not touch
    the accelerator. Reference: `utils/geometry_utils.py:92-133`.

    Returns (h, w, 3) unit normals (NaN where depth is NaN)."""
    h, w = depth_hw.shape
    ax = np.arange(kernel_size, dtype=np.float32) - (kernel_size - 1) / 2
    g1 = np.exp(-0.5 * (ax / sigma) ** 2)
    g1 /= g1.sum()
    g2 = np.outer(g1, g1)
    depth = _conv2_same_np(np.asarray(depth_hw, np.float32), g2, "reflect")

    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    xx, yy = np.meshgrid(xs, ys)
    pix = np.stack([xx, yy, np.ones_like(xx)], -1)          # (h, w, 3)
    rays = pix @ np.asarray(invK_44, np.float32)[:3, :3].T
    points = rays * depth[..., None]                        # (h, w, 3)

    sobel_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                       np.float32) / 8.0
    gx = np.stack([_conv2_same_np(points[..., c], sobel_x, "edge")
                   for c in range(3)], -1)
    gy = np.stack([_conv2_same_np(points[..., c], sobel_x.T, "edge")
                   for c in range(3)], -1)
    n = np.cross(gx, gy)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(norm, 1e-12)


def build_image_panels(cur_data: Dict, outputs: Dict,
                       max_items: int = 4) -> np.ndarray:
    """Validation image panels, the reference's primary debugging view
    (`experiment_modules/depth_model.py:540-603`): for up to `max_items`
    batch elements, a row of [RGB | GT depth | pred depth | pred normals
    | CV argmax] tiles; GT and pred share a robust GT value range.

    Returns (N, H, 5*W, 3) float in [0, 1], ready for PNG / TB image
    logging.
    """
    n = min(max_items, np.asarray(cur_data["image_b3hw"]).shape[0])
    panels = []
    for i in range(n):
        image = np.asarray(cur_data["image_b3hw"][i], np.float32)
        rgb = np.clip(reverse_imagenet_normalize_np(image), 0, 1
                      ).transpose(1, 2, 0)
        h, w = rgb.shape[:2]

        if "depth_bhw" in cur_data:
            gt = np.asarray(cur_data["depth_bhw"][i], np.float32)
        elif "depth_b1hw" in cur_data:
            gt = np.asarray(cur_data["depth_b1hw"][i, 0], np.float32)
        else:
            gt = None
        pred = np.asarray(outputs["depth_pred_s0_bhw1"][i, ..., 0],
                          np.float32)
        vmin, vmax = normalize_depth_robust(gt if gt is not None else pred)

        tiles = [rgb]
        tiles.append(_resize_nearest_np(
            colormap_image(gt, vmin, vmax) if gt is not None
            else np.zeros_like(rgb), h, w))
        tiles.append(_resize_nearest_np(colormap_image(pred, vmin, vmax),
                                        h, w))
        if outputs.get("normals_pred_bhw3") is not None:
            nrm = np.asarray(outputs["normals_pred_bhw3"][i], np.float32)
            nrm = np.clip(np.nan_to_num(0.5 * (nrm + 1.0)), 0, 1)
            tiles.append(_resize_nearest_np(nrm, h, w))
        else:
            tiles.append(np.zeros_like(rgb))
        if outputs.get("lowest_cost_bhw") is not None:
            lc = np.asarray(outputs["lowest_cost_bhw"][i], np.float32)
            tiles.append(_resize_nearest_np(colormap_image(lc, vmin, vmax),
                                            h, w))
        else:
            tiles.append(np.zeros_like(rgb))
        panels.append(np.concatenate(tiles, axis=1))
    return np.stack(panels, axis=0)
