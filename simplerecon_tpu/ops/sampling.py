"""Grid sampling and resizing with PyTorch-parity semantics.

The reference leans on `torch.nn.functional.grid_sample` in three hot spots —
the plane-sweep cost volume (`modules/cost_volume.py:201-212`), the
multi-view depth loss (`losses.py:119-125`) and TSDF integration
(`tools/tsdf.py:277-281`) — always with `align_corners=False` and zeros
padding. These functions reproduce those semantics exactly in XLA (verified
against torch CPU in tests/test_sampling.py) while using a TPU-friendly
NHWC layout and one fused gather per corner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size):
    """Torch align_corners=False: [-1, 1] -> pixel index space."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img_bhwc: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """Gathers img[b, iy, ix, :] with zeros where ~valid.

    img_bhwc: (b, h, w, c); ix/iy/valid: (b, n). Returns (b, n, c).
    """
    b, h, w, c = img_bhwc.shape
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    flat = (iy * w + ix).astype(jnp.int32)  # (b, n)
    img_flat = img_bhwc.reshape(b, h * w, c)
    out = jnp.take_along_axis(img_flat, flat[..., None], axis=1)
    return out * valid[..., None].astype(out.dtype)


def grid_sample(img_bhwc: jnp.ndarray, grid_bn2: jnp.ndarray,
                mode: str = "bilinear") -> jnp.ndarray:
    """torch.nn.functional.grid_sample with padding_mode='zeros',
    align_corners=False, on NHWC images and flattened sample points.

    Args:
        img_bhwc: (b, h, w, c) source image/features.
        grid_bn2: (b, n, 2) normalized sample coords in (x, y) order,
            [-1, 1] spans the image with half-pixel centers.
        mode: "bilinear" or "nearest".

    Returns:
        (b, n, c) sampled values; zero where the sample footprint is fully
        out of bounds.
    """
    b, h, w, c = img_bhwc.shape
    x = _unnormalize(grid_bn2[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid_bn2[..., 1].astype(jnp.float32), h)

    if mode == "nearest":
        # torch uses std::nearbyint (round-half-to-even), as does jnp.round.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        return _gather_2d(img_bhwc, ix, iy, valid)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode {mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(img_bhwc.dtype)
    wy1 = (y - y0).astype(img_bhwc.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    vx0 = (x0 >= 0) & (x0 < w)
    vx1 = (x1 >= 0) & (x1 < w)
    vy0 = (y0 >= 0) & (y0 < h)
    vy1 = (y1 >= 0) & (y1 < h)

    out = (_gather_2d(img_bhwc, x0, y0, vx0 & vy0) * (wx0 * wy0)[..., None]
           + _gather_2d(img_bhwc, x1, y0, vx1 & vy0) * (wx1 * wy0)[..., None]
           + _gather_2d(img_bhwc, x0, y1, vx0 & vy1) * (wx0 * wy1)[..., None]
           + _gather_2d(img_bhwc, x1, y1, vx1 & vy1) * (wx1 * wy1)[..., None])
    return out


def sample_nearest_matmul(img_bhwc: jnp.ndarray, grid_bn2: jnp.ndarray
                          ) -> jnp.ndarray:
    """`grid_sample(mode="nearest")` as one-hot MXU contractions.

    TPU gathers are row-latency-bound (the motivation for the cost
    volume's two-hot matmul warp, `ops/cost_volume.py`); this applies
    the same transform to nearest sampling: a (n, h) one-hot row-select
    matmul followed by a per-sample one-hot column reduce. Numerically
    identical to the gather path (round-half-to-even, zeros padding) —
    used by the multi-view depth loss, where 7 views x 49k samples of
    gather dominated the loss cost at train time.
    """
    b, h, w, c = img_bhwc.shape
    x = _unnormalize(grid_bn2[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid_bn2[..., 1].astype(jnp.float32), h)
    rx = jnp.round(x)
    ry = jnp.round(y)

    def one(img_hwc, rx_n, ry_n):
        iota_h = jnp.arange(h, dtype=jnp.float32)
        iota_w = jnp.arange(w, dtype=jnp.float32)
        oh_y = (ry_n[:, None] == iota_h[None, :]).astype(img_hwc.dtype)
        oh_x = (rx_n[:, None] == iota_w[None, :]).astype(img_hwc.dtype)
        rows = jnp.einsum("nh,hX->nX", oh_y,
                          img_hwc.reshape(h, w * c),
                          preferred_element_type=jnp.float32)
        rows = rows.reshape(-1, w, c)
        return jnp.einsum("nw,nwc->nc", oh_x.astype(jnp.float32), rows)

    out = jax.vmap(one)(img_bhwc, rx, ry)
    return out.astype(img_bhwc.dtype)


def grid_sample_2d(img_bhwc: jnp.ndarray, grid_bhw2: jnp.ndarray,
                   mode: str = "bilinear") -> jnp.ndarray:
    """grid_sample with an (b, h_out, w_out, 2) grid; returns
    (b, h_out, w_out, c)."""
    b, ho, wo, _ = grid_bhw2.shape
    out = grid_sample(img_bhwc, grid_bhw2.reshape(b, ho * wo, 2), mode=mode)
    return out.reshape(b, ho, wo, img_bhwc.shape[-1])


def resize_nearest(img_bhwc: jnp.ndarray, out_h: int, out_w: int
                   ) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') parity: src = floor(dst * scale).

    Used by the eval protocol that nearest-upsamples predictions to the GT
    resolution (`/root/reference/test.py:282-299`).
    """
    b, h, w, c = img_bhwc.shape
    ys = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (h / out_h)
                   ).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (w / out_w)
                   ).astype(jnp.int32)
    return img_bhwc[:, jnp.clip(ys, 0, h - 1)][:, :, jnp.clip(xs, 0, w - 1)]


def _up2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x bilinear upsample along one axis without gathers.

    With align_corners=False the 2x weights are the fixed interleave
    even_j = prev + (cur - prev) * 0.75, odd_j = cur + (next - cur) * 0.25
    (edge-clamped), the same expressions the gather path evaluates — so
    this is bit-identical while lowering to slices + interleave instead
    of XLA gathers (which serialize badly on TPU).
    """
    n = x.shape[axis]
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis), last], axis=axis)
    w75 = jnp.asarray(0.75, dtype=x.dtype)
    w25 = jnp.asarray(0.25, dtype=x.dtype)
    even = prev + (x - prev) * w75
    odd = x + (nxt - x) * w25
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return out.reshape(shape)


def resize_bilinear(img_bhwc: jnp.ndarray, out_h: int, out_w: int
                    ) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) parity.

    Half-pixel source coords clamped at the borders, matching the
    reference's `upsample` helper (`utils/generic_utils.py:96-105`).
    Exact 2x resizes take a gather-free slice+interleave fast path.
    """
    b, h, w, c = img_bhwc.shape
    if out_h == 2 * h and out_w == 2 * w:
        return _up2x_axis(_up2x_axis(img_bhwc, 1), 2)

    def axis_weights(out_n, in_n):
        coord = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * (in_n / out_n) - 0.5
        coord = jnp.clip(coord, 0.0, in_n - 1.0)
        i0 = jnp.floor(coord).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        w1 = coord - i0.astype(jnp.float32)
        return i0, i1, w1.astype(img_bhwc.dtype)

    y0, y1, wy = axis_weights(out_h, h)
    x0, x1, wx = axis_weights(out_w, w)

    top = img_bhwc[:, y0]
    bot = img_bhwc[:, y1]
    rows = top + (bot - top) * wy[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left + (right - left) * wx[None, None, :, None]


def upsample2x(img_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample (align_corners=False), the decoder's upsampler
    (`utils/generic_utils.py:96-105`)."""
    b, h, w, c = img_bhwc.shape
    return resize_bilinear(img_bhwc, 2 * h, 2 * w)
