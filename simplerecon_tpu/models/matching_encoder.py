"""Matching feature encoders (Flax / NHWC).

`ResnetMatchingEncoder` re-designs the reference's antialiased ResNet-18
stem + projection head (`modules/networks.py:149-205`):

  stem:  7x7/2 conv -> BN -> ReLU -> maxpool(2, stride 1) -> BlurPool(4-tap,
         stride 2) -> layer1 (2 standard BN BasicBlocks)
  head:  1x1 conv(128) -> InstanceNorm -> LeakyReLU(0.2) ->
         3x3 conv(16, replicate pad) -> InstanceNorm

The anti-aliased (blur-pool) max-pool is the Zhang 2019 "making convnets
shift-invariant again" variant used by the `antialiased_cnns` package with
its default 4-tap filter, reimplemented here as a depthwise conv.

Output: 16-channel matching features at 1/4 input resolution. Unlike the
torch reference, the XLA version is batch-size invariant at inference (the
reference had to loop images one-by-one for bit-stable eval,
`experiment_modules/depth_model.py:191-245`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.models.layers import conv1x1, instance_norm


def _blur_pool_4tap(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased stride-2 downsample with the binomial [1,3,3,1] filter.

    Matches antialiased_cnns.BlurPool(filt_size=4): ReflectionPad (1,2,1,2)
    then depthwise conv stride 2. This is the SHIPPED formulation
    (`pool_impl="reference"`): despite micro-benching at only ~150 GB/s
    in isolation, it beats the separable slice form `_max_blur_pool` by
    0.7 ms in the full encoder (scripts/ab_stem.py A/B) because XLA
    fuses it with its neighbors.
    """
    k1 = np.array([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k = np.outer(k1, k1)
    k /= k.sum()
    c = x_bhwc.shape[-1]
    xp = jnp.pad(x_bhwc, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="reflect")
    kern = jnp.broadcast_to(jnp.asarray(k, dtype=x_bhwc.dtype)[:, :, None, None],
                            (4, 4, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _max_blur_pool(x_bhwc: jnp.ndarray) -> jnp.ndarray:
    """Fused anti-aliased max-pool: dense 2x2/1 max + BlurPool(4-tap)/2.

    Mathematically identical to `nn.max_pool(x, (2,2), (1,1), VALID)`
    followed by `_blur_pool_4tap` (the outer-product [1,3,3,1] kernel is
    exactly separable; weights 1/8 and 3/8 are exact in bf16), but
    formulated as elementwise max of four shifted slices + two 4-tap
    strided FMA passes.

    NEGATIVE RESULT (round 5, kept for the record): in isolation the
    reference pair micro-benches badly (reduce_window 0.89 ms @ 113
    GB/s + depthwise blur 0.67 ms @ 151 GB/s on 192x256x64 x8), but in
    the full encoder this slice form is 0.7 ms SLOWER (same-process
    interleaved A/B, scripts/ab_stem.py) — XLA fuses the reference pool chain
    with its neighbors, and the strided slices here defeat that.
    `pool_impl="reference"` is the shipped default.
    """
    # dense 2x2 stride-1 max
    m = jnp.maximum(
        jnp.maximum(x_bhwc[:, :-1, :-1], x_bhwc[:, 1:, :-1]),
        jnp.maximum(x_bhwc[:, :-1, 1:], x_bhwc[:, 1:, 1:]))
    # ReflectionPad (1,2),(1,2) like antialiased_cnns.BlurPool(filt=4)
    mp = jnp.pad(m, [(0, 0), (1, 2), (1, 2), (0, 0)], mode="reflect")
    taps = (1.0 / 8.0, 3.0 / 8.0, 3.0 / 8.0, 1.0 / 8.0)
    w_out = (mp.shape[2] - 4) // 2 + 1
    t = sum(jnp.asarray(k, mp.dtype)
            * mp[:, :, j: j + 2 * w_out - 1: 2, :]
            for j, k in enumerate(taps))
    h_out = (mp.shape[1] - 4) // 2 + 1
    return sum(jnp.asarray(k, t.dtype)
               * t[:, i: i + 2 * h_out - 1: 2, :, :]
               for i, k in enumerate(taps))


class _Conv7x7s2(nn.Module):
    """The ResNet stem 7x7/stride-2 conv, evaluated in space-to-depth
    form on the MXU.

    The parameter is the standard `kernel` of shape (7, 7, cin, features)
    (checkpoint-converter and torch-parity mapping unchanged); at apply
    time it is zero-padded to 8x8 at the FRONT and regrouped to a 4x4
    conv over 2x2-packed input pixels — exactly the same sum, since with
    u = 2i + a - 1 every original tap (u, v) maps to packed tap
    (i, j, a, b) and the one missing pair (a=0, i=0 -> u=-1) hits the
    zero pad.

    NEGATIVE RESULT (round 5, kept for the record): the packed conv
    alone is 10x faster in isolation (0.09 vs 0.93 ms at (8,384,512,3);
    4% -> 26% MXU), but the input packing (either a minor-dim-3
    transpose or four strided slices) costs more than the conv saves in
    the full encoder: same-process A/B (scripts/ab_stem.py) read direct 2.16 ms
    vs s2d 3.03-3.93 ms end-to-end. `impl="direct"` is the shipped
    default; the s2d form is kept for future hardware/compilers.
    """
    features: int = 64
    impl: str = "s2d"  # "s2d" (packed 4x4) | "direct" (plain 7x7/2)
    pack: str = "slices"  # s2d input packing: "slices" | "transpose"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x_bhw3: jnp.ndarray) -> jnp.ndarray:
        n, h, w, cin = x_bhw3.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, cin, self.features))
        dtype = self.dtype or x_bhw3.dtype
        x = x_bhw3.astype(dtype)
        if self.impl == "direct" or h % 2 or w % 2:
            # direct form (also the odd-spatial-dims fallback)
            return jax.lax.conv_general_dilated(
                x, kernel.astype(dtype), window_strides=(2, 2),
                padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kp = jnp.pad(kernel, [(1, 0), (1, 0), (0, 0), (0, 0)])
        # (8,8,cin,f) -> (i,a,j,b,cin,f) -> (i,j,a,b,cin,f) -> 4x4 conv
        kp = kp.reshape(4, 2, 4, 2, cin, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * cin, self.features)
        if self.pack == "transpose":
            xs = x.reshape(n, h // 2, 2, w // 2, 2, cin)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h // 2, w // 2, 4 * cin)
        else:
            # channel order (a, b, cin): row-major over the 2x2 block
            xs = jnp.concatenate(
                [x[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)],
                axis=-1)
        return jax.lax.conv_general_dilated(
            xs, kp.astype(dtype), window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _make_norm(norm: str, train: bool, dtype):
    """Norm factory for the matching stem: "batch" (reference parity,
    running stats) or "group" (GroupNorm-8: train == eval, no running
    stats — the eval-metric-lag ablation, see STATUS norm decision)."""
    def apply(h, name):
        if norm == "group":
            return nn.GroupNorm(num_groups=8, epsilon=1e-5, name=name,
                                dtype=dtype)(h)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name=name, dtype=dtype)(h)
    return apply


class _ResNetBasicBlock(nn.Module):
    """Standard torchvision BasicBlock: BN + ReLU, bias-free convs."""
    planes: int
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = _make_norm(self.norm, train, self.dtype)

        identity = x
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = jax.nn.relu(bn(out, "bn1"))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = bn(out, "bn2")
        return jax.nn.relu(out + identity)


class ResnetMatchingEncoder(nn.Module):
    """ResNet-18-stem matching encoder -> `num_ch_out` feats at 1/4 res.

    `stage_out` truncates the forward after a named stage ("conv1",
    "pool", "layer1") — a profiling tap that keeps sub-stage timings on
    the exact production code path; default (None) is the full head.

    `norm="group"` swaps every BatchNorm for GroupNorm-8 (train == eval;
    no running stats): the eval-metric-lag ablation. Default "batch"
    keeps reference checkpoint parity.
    """
    num_ch_out: int = 16
    norm: str = "batch"
    # Stem-implementation knobs. The defaults are the DIRECT forms: a
    # same-process interleaved A/B on v5e (scripts/ab_stem.py, round 5) read
    # direct+reference-pool 2.16 ms vs s2d/fused rewrites 2.87-3.93 ms
    # for the full encoder at (8, 384, 512, 3) — the isolated micro-
    # bench wins (7x7/2 at 4% MXU vs 26% packed; reduce_window at 113
    # GB/s) do NOT compose in context, where XLA fuses the pool chain
    # into its neighbors. Variants kept for A/B reproducibility.
    stem_impl: str = "direct"    # "direct" | "s2d" (_Conv7x7s2 knob)
    stem_pack: str = "slices"    # s2d packing: "slices" | "transpose"
    # "pallas" = the fused max+blur Pallas kernel (ops/pallas_pool.py):
    # one VMEM pass instead of the 3-stage XLA chain; falls back to the
    # identical-semantics XLA form off-TPU / on unsupported shapes.
    pool_impl: str = "reference"  # "reference" | "fused" | "pallas"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image_bhw3: jnp.ndarray, train: bool = False,
                 stage_out: str | None = None) -> jnp.ndarray:
        x = _Conv7x7s2(64, impl=self.stem_impl, pack=self.stem_pack,
                       dtype=self.dtype, name="conv1")(image_bhw3)
        x = _make_norm(self.norm, train, self.dtype)(x, "bn1")
        x = jax.nn.relu(x)
        if stage_out == "conv1":
            return x
        # anti-aliased max-pool: dense 2x2/1 max then blur-pool stride 2
        if self.pool_impl == "pallas":
            from simplerecon_tpu.ops.pallas_pool import max_blur_pool
            x = max_blur_pool(x)
        elif self.pool_impl == "reference":
            x = _blur_pool_4tap(nn.max_pool(x, (2, 2), strides=(1, 1),
                                            padding="VALID"))
        else:
            x = _max_blur_pool(x)
        if stage_out == "pool":
            return x
        x = _ResNetBasicBlock(64, norm=self.norm, dtype=self.dtype,
                              name="layer1_0")(x, train)
        x = _ResNetBasicBlock(64, norm=self.norm, dtype=self.dtype,
                              name="layer1_1")(x, train)
        if stage_out == "layer1":
            return x

        # projection head (`modules/networks.py:189-202`)
        x = conv1x1(128, use_bias=True, name="head_conv1",
                    dtype=self.dtype)(x)
        x = instance_norm(x.astype(jnp.float32)).astype(x.dtype)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        x = nn.Conv(self.num_ch_out, (3, 3), padding="VALID", use_bias=True,
                    name="head_conv2", dtype=self.dtype)(xp)
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)


class _MnasDsConv(nn.Module):
    """timm DepthwiseSeparableConv (mnasnet blocks.0.0): dw 3x3/1 -> BN ->
    ReLU -> pw 1x1 -> BN, no skip. Param names follow timm's state dict
    (conv_dw/bn1/conv_pw/bn2) so reference checkpoints map 1:1."""
    out_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=c, use_bias=False, name="conv_dw",
                    dtype=self.dtype)(x)
        h = jax.nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pw",
                    dtype=self.dtype)(h)
        return bn(h, "bn2")


class _MnasIR(nn.Module):
    """timm InvertedResidual as used by mnasnet_100: pw expand -> BN ->
    ReLU -> dw kxk/s -> BN -> ReLU -> pw linear -> BN (+skip when
    stride 1 and channels match). Names match timm's state dict
    (conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3)."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    exp_ratio: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        mid = x.shape[-1] * self.exp_ratio
        pad = self.kernel // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw",
                    dtype=self.dtype)(x)
        h = jax.nn.relu(bn(h, "bn1"))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), feature_group_count=mid,
                    use_bias=False, name="conv_dw", dtype=self.dtype)(h)
        h = jax.nn.relu(bn(h, "bn2"))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pwl",
                    dtype=self.dtype)(h)
        h = bn(h, "bn3")
        if self.stride == 1 and x.shape[-1] == self.out_ch:
            h = h + x
        return h


# mnasnet_b1 arch (timm `_gen_mnasnet_b1`): per stage a list of
# (repeats, kernel, stride, expansion, out_ch). Stage 0 is the
# depthwise-separable block.
_MNASNET_B1_STAGES = (
    (3, 3, 2, 3, 24),    # blocks.1  -> feat_1 (stride 4)
    (3, 5, 2, 3, 40),    # blocks.2  -> feat_2 (stride 8)
    (3, 5, 2, 6, 80),    # blocks.3
    (2, 3, 1, 6, 96),    # blocks.4  -> feat_3 (stride 16)
    (4, 5, 2, 6, 192),   # blocks.5
    (1, 3, 1, 6, 320),   # blocks.6  -> feat_4 (stride 32)
)


class UNetMatchingEncoder(nn.Module):
    """FPN matching encoder, faithful to the reference
    (`modules/networks.py:207-228`): timm `mnasnet_100` features_only
    (5 levels, channels [16, 24, 40, 96, 320], strides 2..32) + the
    torchvision 0.11 `FeaturePyramidNetwork(out_channels=32)` top-down
    path, reading the stride-4 `feat_1` output, then
    LeakyReLU(0.2) -> 1x1 conv -> InstanceNorm to `num_ch_out`.

    Only the FPN levels on the path to `feat_1` are instantiated
    (inner 1..4 + layer 1); torchvision computes the other outputs too
    but they are unused by the reference model. Parameter names mirror
    the torch state dicts so `convert_reference_checkpoint` maps them
    directly."""
    num_ch_out: int = 16
    fpn_channels: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image_bhw3: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        # --- mnasnet_100 bottom-up ---
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv_stem",
                    dtype=self.dtype)(image_bhw3)
        x = jax.nn.relu(bn(x, "bn1"))
        x = _MnasDsConv(16, dtype=self.dtype, name="blocks_0_0")(x, train)

        feats = [x]  # feat_0, stride 2
        for s, (repeats, k, stride, exp, out_ch) in enumerate(
                _MNASNET_B1_STAGES, start=1):
            for b in range(repeats):
                x = _MnasIR(out_ch, kernel=k, stride=stride if b == 0 else 1,
                            exp_ratio=exp, dtype=self.dtype,
                            name=f"blocks_{s}_{b}")(x, train)
            if s in (1, 2, 4, 6):  # timm feature_info out points
                feats.append(x)
        # feats: stride 2/4/8/16/32, channels 16/24/40/96/320

        # --- torchvision FeaturePyramidNetwork top-down to feat_1 ---
        f = self.fpn_channels
        last_inner = conv1x1(f, use_bias=True, name="inner_4",
                             dtype=self.dtype)(feats[4])
        for idx in (3, 2, 1):
            lateral = conv1x1(f, use_bias=True, name=f"inner_{idx}",
                              dtype=self.dtype)(feats[idx])
            if lateral.shape[1:3] == (2 * last_inner.shape[1],
                                      2 * last_inner.shape[2]):
                # exact 2x nearest == 2x2 pixel repeat (src = floor(dst/2)),
                # a broadcast+reshape instead of jax.image.resize's gather
                top_down = jnp.repeat(jnp.repeat(last_inner, 2, axis=1),
                                      2, axis=2)
            else:
                top_down = jax.image.resize(
                    last_inner,
                    (last_inner.shape[0],) + lateral.shape[1:3] + (f,),
                    "nearest")
            last_inner = lateral + top_down
        p1 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                     name="layer_1", dtype=self.dtype)(last_inner)

        # --- outconv head (`modules/networks.py:220-225`) ---
        x = jax.nn.leaky_relu(p1, negative_slope=0.2)
        x = conv1x1(self.num_ch_out, use_bias=True, name="outconv",
                    dtype=self.dtype)(x)
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
