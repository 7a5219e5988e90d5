"""Image filtering ops (NHWC, depthwise) used by losses and normals.

These reimplement the small set of Kornia filters the reference depends on
(`losses.py:26-31`, `utils/generic_utils.py:87-94`,
`utils/geometry_utils.py:116-124`) as TPU-friendly depthwise convolutions:

  * gaussian_blur      — kornia.filters.gaussian_blur2d (reflect padding)
  * spatial_gradient   — kornia.filters.spatial_gradient (normalized Sobel,
                         replicate padding); returns (..., c, 2) with
                         (d/dx, d/dy) per channel
  * blur_pool          — kornia blur_pool2d / antialiased-cnns BlurPool:
                         reflect pad, binomial 3x3, stride 2
  * pyrdown            — 4-level blur_pool pyramid (`generic_utils.py:87-94`)
  * imagenet_normalize — channel statistics (`generic_utils.py:147-159`)
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def imagenet_normalize(image_bhw3: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=image_bhw3.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=image_bhw3.dtype)
    return (image_bhw3 - mean) / std


def reverse_imagenet_normalize(image_bhw3: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=image_bhw3.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=image_bhw3.dtype)
    return image_bhw3 * std + mean


def _depthwise_conv(x_bhwc: jnp.ndarray, kernel_hw: jnp.ndarray,
                    stride: int = 1) -> jnp.ndarray:
    """Applies the same 2D kernel to every channel (VALID padding)."""
    c = x_bhwc.shape[-1]
    kh, kw = kernel_hw.shape
    k = jnp.broadcast_to(kernel_hw.astype(x_bhwc.dtype)[:, :, None, None],
                         (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x_bhwc, k, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _pad_spatial(x_bhwc: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    cfg = [(0, 0), (pad, pad), (pad, pad), (0, 0)]
    if mode == "reflect":
        return jnp.pad(x_bhwc, cfg, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x_bhwc, cfg, mode="edge")
    raise ValueError(mode)


@functools.lru_cache(maxsize=16)
def _gaussian_kernel_np(kernel_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(kernel_size, dtype=np.float32) - (kernel_size - 1) / 2.0
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def gaussian_blur(x_bhwc: jnp.ndarray, kernel_size: int = 5,
                  sigma: float = 2.0) -> jnp.ndarray:
    """Gaussian blur with reflect padding (kornia.gaussian_blur2d parity)."""
    pad = kernel_size // 2
    k = jnp.asarray(_gaussian_kernel_np(kernel_size, float(sigma)))
    return _depthwise_conv(_pad_spatial(x_bhwc, pad, "reflect"), k)


_SOBEL_X = np.array([[-1.0, 0.0, 1.0],
                     [-2.0, 0.0, 2.0],
                     [-1.0, 0.0, 1.0]], dtype=np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T.copy()


def spatial_gradient(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Normalized Sobel gradients with replicate padding.

    Returns (b, h, w, c, 2) stacking (d/dx, d/dy), matching the channel order
    of kornia.filters.spatial_gradient used by `NormalGenerator`
    (`utils/geometry_utils.py:124-133`) and `MSGradientLoss`
    (`losses.py:26-31`).
    """
    xp = _pad_spatial(x_bhwc, 1, "replicate")
    gx = _depthwise_conv(xp, jnp.asarray(_SOBEL_X))
    gy = _depthwise_conv(xp, jnp.asarray(_SOBEL_Y))
    return jnp.stack([gx, gy], axis=-1)


_BINOMIAL3 = np.array([[1.0, 2.0, 1.0],
                       [2.0, 4.0, 2.0],
                       [1.0, 2.0, 1.0]], dtype=np.float32) / 16.0


def blur_pool(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample: reflect pad 1, binomial 3x3, stride 2.

    This is both kornia's blur_pool2d (the reference's `pyrdown`,
    `utils/generic_utils.py:87-94`) and the BlurPool layer in the
    antialiased-cnns ResNet matching encoder (`modules/networks.py:149-205`).
    """
    return _depthwise_conv(_pad_spatial(x_bhwc, 1, "reflect"),
                           jnp.asarray(_BINOMIAL3), stride=2)


def pyrdown(x_bhwc: jnp.ndarray, num_scales: int = 4) -> List[jnp.ndarray]:
    """Blur-pool pyramid: [x, down2(x), down4(x), down8(x)]."""
    out = [x_bhwc]
    for _ in range(num_scales - 1):
        out.append(blur_pool(out[-1]))
    return out
