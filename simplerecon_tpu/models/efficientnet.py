"""EfficientNetV2-S feature extractor (Flax / NHWC), features_only.

The reference's image-prior encoder is timm's `tf_efficientnetv2_s_in21ft1k`
with `features_only=True` (`experiment_modules/depth_model.py:109-117`),
yielding 5 feature maps at strides [2, 4, 8, 16, 32] with channels
[24, 48, 64, 160, 256]. This is a from-scratch implementation of that
architecture (Tan & Le 2021, EfficientNetV2) with TF-style "SAME" padding
and BatchNorm(eps=1e-3), so converted tf_* weights are numerically exact.

Block layout (the v2-S config):
    stem   conv3x3/2 -> 24
    s0     2  x ConvBnAct        k3 s1 c24
    s1     4  x FusedMBConv      k3 s2 e4 c48
    s2     4  x FusedMBConv      k3 s2 e4 c64
    s3     6  x MBConv           k3 s2 e4 c128 se0.25
    s4     9  x MBConv           k3 s1 e6 c160 se0.25
    s5     15 x MBConv           k3 s2 e6 c256 se0.25
Feature taps: after s0, s1, s2, s4, s5.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (block_type, repeats, stride, expand, channels, se_ratio)
V2_S_CONFIG: Tuple = (
    ("cn", 2, 1, 1, 24, 0.0),
    ("er", 4, 2, 4, 48, 0.0),
    ("er", 4, 2, 4, 64, 0.0),
    ("ir", 6, 2, 4, 128, 0.25),
    ("ir", 9, 1, 6, 160, 0.25),
    ("ir", 15, 2, 6, 256, 0.25),
)
# indices into the stage list whose outputs are returned (strides 2..32)
V2_S_FEATURE_STAGES = (0, 1, 2, 4, 5)
V2_S_FEATURE_CHANNELS = (24, 48, 64, 160, 256)


def _bn(train: bool, name: str, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name, dtype=dtype)


class _ConvBnAct(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = self.stride == 1 and x.shape[-1] == self.features
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding="SAME", use_bias=False, name="conv",
                      dtype=self.dtype)(x)
        out = jax.nn.silu(_bn(train, "bn1", self.dtype)(out))
        return out + x if skip else out


class _SqueezeExcite(nn.Module):
    rd_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_features, (1, 1), use_bias=True,
                    name="conv_reduce", dtype=self.dtype)(pooled)
        s = jax.nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="conv_expand",
                    dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


class _FusedMBConv(nn.Module):
    """EdgeResidual: fused expand conv 3x3 + pointwise-linear."""
    features: int
    stride: int = 1
    expand: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        skip = self.stride == 1 and in_ch == self.features
        out = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2, padding="SAME",
                      use_bias=False, name="conv_exp", dtype=self.dtype)(x)
        out = jax.nn.silu(_bn(train, "bn1", self.dtype)(out))
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pwl",
                      dtype=self.dtype)(out)
        out = _bn(train, "bn2", self.dtype)(out)
        return out + x if skip else out


class _MBConv(nn.Module):
    """InvertedResidual with depthwise 3x3 and squeeze-excite."""
    features: int
    stride: int = 1
    expand: int = 6
    se_ratio: float = 0.25
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        skip = self.stride == 1 and in_ch == self.features
        out = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw",
                      dtype=self.dtype)(x)
        out = jax.nn.silu(_bn(train, "bn1", self.dtype)(out))
        out = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2, padding="SAME",
                      feature_group_count=mid, use_bias=False, name="conv_dw",
                      dtype=self.dtype)(out)
        out = jax.nn.silu(_bn(train, "bn2", self.dtype)(out))
        out = _SqueezeExcite(max(1, round(in_ch * self.se_ratio)),
                             dtype=self.dtype, name="se")(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv_pwl",
                      dtype=self.dtype)(out)
        out = _bn(train, "bn3", self.dtype)(out)
        return out + x if skip else out


class EfficientNetV2Features(nn.Module):
    """EfficientNetV2 backbone returning the 5-scale feature pyramid."""
    config: Tuple = V2_S_CONFIG
    feature_stages: Tuple[int, ...] = V2_S_FEATURE_STAGES
    stem_features: int = 24
    dtype: jnp.dtype | None = None

    @property
    def num_ch_enc(self) -> List[int]:
        return [self.config[s][4] for s in self.feature_stages]

    @nn.compact
    def __call__(self, image_bhw3: jnp.ndarray, train: bool = False
                 ) -> List[jnp.ndarray]:
        x = nn.Conv(self.stem_features, (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, name="conv_stem",
                    dtype=self.dtype)(image_bhw3)
        x = jax.nn.silu(_bn(train, "bn_stem", self.dtype)(x))

        feats = []
        for si, (btype, repeats, stride, expand, ch, se) in enumerate(
                self.config):
            for bi in range(repeats):
                s = stride if bi == 0 else 1
                name = f"stage{si}_block{bi}"
                if btype == "cn":
                    x = _ConvBnAct(ch, s, dtype=self.dtype, name=name)(x, train)
                elif btype == "er":
                    x = _FusedMBConv(ch, s, expand, dtype=self.dtype,
                                     name=name)(x, train)
                elif btype == "ir":
                    x = _MBConv(ch, s, expand, se, dtype=self.dtype,
                                name=name)(x, train)
                else:
                    raise ValueError(btype)
            if si in self.feature_stages:
                feats.append(x)
        return feats
