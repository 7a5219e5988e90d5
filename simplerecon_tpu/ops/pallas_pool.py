"""Fused anti-aliased max-blur-pool Pallas kernel (fwd + hand-written bwd).

The matching encoder's stem pool (`models/matching_encoder.py`) is the
reference's antialiased max-pool: dense `max_pool(2,2/stride 1, VALID)`
followed by `BlurPool(filt=4)` — ReflectionPad(1,2,1,2) + depthwise
[1,3,3,1]x[1,3,3,1]/64 conv stride 2 (`antialiased_cnns`; reference usage
`modules/networks.py:149-205`). As separate XLA ops this chain costs
~20 ms fwd+bwd of the 544 ms b16 train step (round-5 device trace:
select-and-scatter 4.4 ms + pad/blur/slice fusions at batch 128) because
every stage materializes a (b,H,W,C)-scale intermediate in HBM.

This kernel computes the whole chain in one VMEM pass per row-tile:

  * grid (batch, H_out/T); each cell emits T output rows.
  * the halo rows the blur needs across tile boundaries come from two
    extra 8-row blocked views of the same input (no manual DMA, so
    interpret mode works on CPU for tests).
  * the stride-2 W blur (with its reflect pad) is a constant banded
    matrix B of shape (W-1, W/2) applied on the MXU: tw = B^T @ maxrows;
    the reflection is baked into B, so W edges are exact by construction.
  * the H blur is 4 unrolled FMAs per output row over the tw scratch,
    with reflect fix-ups on the first/last grid rows.

Backward (`custom_vjp`): a second kernel recomputes the window maxima in
VMEM and routes the blur-transposed gradient to the FIRST maximal element
of each 2x2 window in row-major order — exactly XLA's select-and-scatter
semantics for `reduce_window(max)` (GE select), so it matches autodiff of
the unfused reference chain, ties after ReLU included.

Shape support (production conv1 output is (b, 192, 256, 64)): H, W even,
H/2 divisible by 8, W/2 >= 8. Anything else transparently falls back to
the unfused XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K4 = (0.125, 0.375, 0.375, 0.125)  # [1,3,3,1]/8, exact in bf16


def _reflect_m(p: int, n: int) -> int:
    """Reflect an m-space index into [0, n) per pad(1,2) 'reflect'."""
    if p < 0:
        return -p
    if p >= n:
        return 2 * (n - 1) - p
    return p


@functools.lru_cache(maxsize=8)
def _blur_matrix_np(w: int) -> np.ndarray:
    """B[(W-1), W/2]: tw[j] = sum_w B[w, j] * m[w] — the stride-2 4-tap
    W blur over max-row m with ReflectionPad(1,2) baked in."""
    n = w - 1
    bmat = np.zeros((n, w // 2), dtype=np.float32)
    for j in range(w // 2):
        for b, k in enumerate(_K4):
            bmat[_reflect_m(2 * j + b - 1, n), j] += k
    return bmat


def max_blur_pool_xla(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Unfused reference chain (identical math; the fallback path).

    The dense max uses `lax.reduce_window` — the same primitive as the
    model's `nn.max_pool` — so its autodiff routes tie gradients to the
    FIRST maximal window element (select-and-scatter GE semantics),
    matching the hand-written backward kernel exactly."""
    m = jax.lax.reduce_window(
        x_bhwc, -jnp.inf, jax.lax.max,
        (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
    mp = jnp.pad(m, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="reflect")
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    c = x_bhwc.shape[-1]
    kern = jnp.broadcast_to(
        jnp.asarray(k2, dtype=x_bhwc.dtype)[:, :, None, None], (4, 4, 1, c))
    return jax.lax.conv_general_dilated(
        mp, kern, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _pick_tile(hout: int) -> int:
    return 16 if hout % 16 == 0 else 8


def _supported(shape) -> bool:
    _, h, w, _ = shape
    if h % 2 or w % 2:
        return False
    return (h // 2) % 8 == 0 and w // 2 >= 8


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(xm_ref, xb_ref, xt_ref, bmat_ref, out_ref, tw_ref, *,
                tile: int, n_tiles: int):
    t2 = 2 * tile
    pid = pl.program_id(1)

    def xrow(r):  # r in [-1, t2+1] relative to the main block start 2*i0
        if r < 0:
            return xb_ref[0, 8 + r]
        if r < t2:
            return xm_ref[0, r]
        return xt_ref[0, r - t2]

    bmat = bmat_ref[...]
    # window rows p = 2*i0 - 1 + t for t in [0, t2+1]
    for t in range(t2 + 2):
        row = jnp.maximum(xrow(t - 1), xrow(t))        # (W, C)
        rowm = jnp.maximum(row[:-1], row[1:])          # (W-1, C)
        tw_ref[t] = jax.lax.dot_general(
            bmat, rowm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (W/2, C)

    for i in range(tile):
        acc = sum(jnp.float32(k) * tw_ref[2 * i + a]
                  for a, k in enumerate(_K4))
        out_ref[0, i] = acc.astype(out_ref.dtype)

    # H reflect fix-ups: global row 0's a=0 tap reads m[1], not m[-1];
    # the global last row's a=2,3 taps read m[H-3], m[H-4].
    @pl.when(pid == 0)
    def _():
        out_ref[0, 0] = (out_ref[0, 0].astype(jnp.float32)
                         + jnp.float32(_K4[0]) * (tw_ref[2] - tw_ref[0])
                         ).astype(out_ref.dtype)

    @pl.when(pid == n_tiles - 1)
    def _():
        fix = (jnp.float32(_K4[2]) * (tw_ref[t2 - 2] - tw_ref[t2])
               + jnp.float32(_K4[3]) * (tw_ref[t2 - 3] - tw_ref[t2 + 1]))
        out_ref[0, tile - 1] = (
            out_ref[0, tile - 1].astype(jnp.float32) + fix
        ).astype(out_ref.dtype)


def _fwd_pallas(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    hout, wout = h // 2, w // 2
    tile = _pick_tile(hout)
    n_tiles = hout // tile
    t2 = 2 * tile
    nh8 = h // 8
    bmat = jnp.asarray(_blur_matrix_np(w)).astype(x.dtype)

    def im_main(bi, hi):
        return (bi, hi, 0, 0)

    def im_bot(bi, hi):
        return (bi, jnp.maximum(tile * hi // 4 - 1, 0), 0, 0)

    def im_top(bi, hi):
        return (bi, jnp.minimum(tile * (hi + 1) // 4, nh8 - 1), 0, 0)

    kern = functools.partial(_fwd_kernel, tile=tile, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t2, w, c), im_main),
            pl.BlockSpec((1, 8, w, c), im_bot),
            pl.BlockSpec((1, 8, w, c), im_top),
            pl.BlockSpec((w - 1, wout), lambda bi, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, wout, c), im_main),
        out_shape=jax.ShapeDtypeStruct((b, hout, wout, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t2 + 2, wout, c), jnp.float32)],
        interpret=interpret,
    )(x, x, x, bmat)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(xm_ref, xb_ref, xt_ref, gm_ref, gb_ref, gt_ref, bmat_ref,
                dx_ref, acc_ref, *, tile: int, n_tiles: int):
    """dx rows [2*i0, 2*i0 + 2T). For each window row p in
    [2*i0 - 1, 2*i0 + 2T - 1]: g_tw[p] (H-blur transpose of g incl.
    reflect gains), g_m[p] = B @ g_tw[p] (W-blur transpose incl. reflect),
    then route to the first maximal element of each 2x2 window."""
    t2 = 2 * tile
    pid = pl.program_id(1)
    first = pid == 0
    last = pid == n_tiles - 1

    def xrow(r):  # r in [-1, t2] relative to dx block start 2*i0
        if r < 0:
            return xb_ref[0, 8 + r]
        if r < t2:
            return xm_ref[0, r]
        return xt_ref[0, r - t2]

    def grow(i):  # i in [-1, tile] relative to out-row block start i0
        if i < 0:
            return gb_ref[0, 8 + i]
        if i < tile:
            return gm_ref[0, i]
        return gt_ref[0, i - tile]

    bmat = bmat_ref[...]
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    for t in range(t2 + 1):
        # H-blur transpose: out[i] reads tw[p] with p = 2i + a - 1
        # -> i_local = (t - a) / 2 for taps with matching parity.
        gtw = jnp.zeros((bmat.shape[1], xm_ref.shape[3]), jnp.float32)
        for a in range(4):
            if (t - a) % 2 != 0:
                continue
            il = (t - a) // 2
            if il < -1 or il > tile:
                continue
            g = grow(il).astype(jnp.float32)
            if il == -1:   # global i = i0 - 1: absent on the first tile
                g = jnp.where(first, 0.0, g)
            if il == tile:  # global i = i0 + T: absent on the last tile
                g = jnp.where(last, 0.0, g)
            gtw = gtw + jnp.float32(_K4[a]) * g
        # H reflect gains (mirror of the fwd fix-ups):
        if t == 2:          # p = 1 <- k0 * g[global 0]
            gtw = gtw + jnp.where(first, jnp.float32(_K4[0]),
                                  0.0) * grow(0).astype(jnp.float32)
        if t == t2 - 2:     # p = H - 3 <- k2 * g[global last]
            gtw = gtw + jnp.where(last, jnp.float32(_K4[2]),
                                  0.0) * grow(tile - 1).astype(jnp.float32)
        if t == t2 - 3:     # p = H - 4 <- k3 * g[global last]
            gtw = gtw + jnp.where(last, jnp.float32(_K4[3]),
                                  0.0) * grow(tile - 1).astype(jnp.float32)

        g_m = jax.lax.dot_general(
            bmat, gtw.astype(bmat.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (W-1, C)

        # invalid window rows: p = -1 (first tile, t=0) and p = H-1
        # (last tile, t=t2) have no 2x2 window
        if t == 0:
            g_m = jnp.where(first, 0.0, g_m)
        if t == t2:
            g_m = jnp.where(last, 0.0, g_m)

        # recompute the window maxima for window row p (x rows p, p+1)
        ra, rb = xrow(t - 1), xrow(t)
        e00, e01 = ra[:-1], ra[1:]
        e10, e11 = rb[:-1], rb[1:]
        m = jnp.maximum(jnp.maximum(e00, e01), jnp.maximum(e10, e11))
        w00 = e00 == m
        w01 = (e01 == m) & ~w00
        w10 = (e10 == m) & ~w00 & ~w01
        w11 = (e11 == m) & ~w00 & ~w01 & ~w10

        def scatter_row(r_local, wlo, whi):
            # x row r gets window-col w's grad at col-offset 0 (mask wlo)
            # and window-col w-1's grad at col-offset 1 (mask whi)
            if not 0 <= r_local < t2:
                return
            lo = jnp.where(wlo, g_m, 0.0)
            hi = jnp.where(whi, g_m, 0.0)
            contrib = (jnp.pad(lo, ((0, 1), (0, 0)))
                       + jnp.pad(hi, ((1, 0), (0, 0))))
            acc_ref[r_local] = acc_ref[r_local] + contrib

        scatter_row(t - 1, w00, w01)   # x row p (upper window row)
        scatter_row(t, w10, w11)       # x row p+1 (lower window row)

    dx_ref[0] = acc_ref[...].astype(dx_ref.dtype)


def _bwd_pallas(x: jnp.ndarray, g: jnp.ndarray,
                interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    hout, wout = h // 2, w // 2
    tile = _pick_tile(hout)
    n_tiles = hout // tile
    t2 = 2 * tile
    nh8 = h // 8
    ng8 = hout // 8
    bmat = jnp.asarray(_blur_matrix_np(w)).astype(x.dtype)

    def im_x(bi, hi):
        return (bi, hi, 0, 0)

    def im_xb(bi, hi):
        return (bi, jnp.maximum(tile * hi // 4 - 1, 0), 0, 0)

    def im_xt(bi, hi):
        return (bi, jnp.minimum(tile * (hi + 1) // 4, nh8 - 1), 0, 0)

    def im_g(bi, hi):
        return (bi, hi, 0, 0)

    def im_gb(bi, hi):
        return (bi, jnp.maximum(tile * hi // 8 - 1, 0), 0, 0)

    def im_gt(bi, hi):
        return (bi, jnp.minimum(tile * (hi + 1) // 8, ng8 - 1), 0, 0)

    kern = functools.partial(_bwd_kernel, tile=tile, n_tiles=n_tiles)
    return pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t2, w, c), im_x),
            pl.BlockSpec((1, 8, w, c), im_xb),
            pl.BlockSpec((1, 8, w, c), im_xt),
            pl.BlockSpec((1, tile, wout, c), im_g),
            pl.BlockSpec((1, 8, wout, c), im_gb),
            pl.BlockSpec((1, 8, wout, c), im_gt),
            pl.BlockSpec((w - 1, wout), lambda bi, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t2, w, c), im_x),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t2, w, c), jnp.float32)],
        interpret=interpret,
    )(x, x, x, g, g, g, bmat)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_blur_pool_pallas(x_bhwc: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused max(2,2/stride 1) + BlurPool(4)/2 with a hand-written VJP.

    Falls back to the unfused XLA chain for unsupported shapes."""
    if not _supported(x_bhwc.shape):
        return max_blur_pool_xla(x_bhwc)
    return _fwd_pallas(x_bhwc, interpret)


def _mbp_fwd(x, interpret):
    return max_blur_pool_pallas(x, interpret), x


def _mbp_bwd(interpret, x, g):
    if not _supported(x.shape):
        _, vjp = jax.vjp(max_blur_pool_xla, x)
        return (vjp(g)[0],)
    return (_bwd_pallas(x, g, interpret),)


max_blur_pool_pallas.defvjp(_mbp_fwd, _mbp_bwd)


def max_blur_pool(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Production entry: the fused kernel on TPU, the identical-semantics
    XLA chain elsewhere (interpret-mode at encoder-scale grids is a
    compile hazard on 1-core CI hosts, same policy as the sweep
    kernels)."""
    if jax.default_backend() != "tpu" or not _supported(x_bhwc.shape):
        return max_blur_pool_xla(x_bhwc)
    return max_blur_pool_pallas(x_bhwc, False)
