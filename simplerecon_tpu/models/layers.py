"""Building-block layers (Flax / NHWC).

Re-designs the reference's `modules/layers.py` for TPU:

  * `BasicBlock` — ResNet basic block with **no norm by default** (so conv
    bias is on) and LeakyReLU(0.2), exactly the variant the reference uses
    throughout its CV encoder and depth decoder (`modules/layers.py:24-85`).
  * `MLP` — Dense stack with default-slope LeakyReLU(0.01) between layers
    (`modules/networks.py:129-147`); the cost-volume reducer.
  * `instance_norm` — torch `nn.InstanceNorm2d(affine=False)` semantics.

Convolutions use explicit symmetric padding (torch-style) rather than XLA
"SAME" so that converted PyTorch weights are numerically exact for strided
convs too.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv3x3(features: int, stride: int = 1, use_bias: bool = False,
            name: str | None = None, dtype=None) -> nn.Conv:
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), use_bias=use_bias, name=name,
                   dtype=dtype)


def conv1x1(features: int, stride: int = 1, use_bias: bool = False,
            name: str | None = None, dtype=None) -> nn.Conv:
    return nn.Conv(features, (1, 1), strides=(stride, stride),
                   padding="VALID", use_bias=use_bias, name=name, dtype=dtype)


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def instance_norm(x_bhwc: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d(affine=False, track_running_stats=False):
    per-sample, per-channel spatial standardization with biased variance."""
    mean = jnp.mean(x_bhwc, axis=(1, 2), keepdims=True)
    var = jnp.var(x_bhwc, axis=(1, 2), keepdims=True)
    return (x_bhwc - mean) * jax.lax.rsqrt(var + eps)


class BasicBlock(nn.Module):
    """ResNet BasicBlock, norm-free by default (`modules/layers.py:24-85`).

    With `norm="none"` (the reference default for decoder/CV-encoder blocks)
    convolutions carry a bias; with `norm="batch"` they don't and a
    BatchNorm follows each conv (used inside the ResNet-18 matching stem).
    """
    planes: int
    stride: int = 1
    norm: str = "none"  # "none" | "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_bias = self.norm == "none"

        def maybe_norm(h, name):
            if self.norm == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5, name=name,
                                    dtype=self.dtype)(h)
            return h

        inplanes = x.shape[-1]
        identity = x

        out = conv3x3(self.planes, self.stride, use_bias, "conv1",
                      self.dtype)(x)
        out = maybe_norm(out, "bn1")
        out = leaky_relu02(out)
        out = conv3x3(self.planes, 1, use_bias, "conv2", self.dtype)(out)
        out = maybe_norm(out, "bn2")

        if inplanes != self.planes or self.stride != 1:
            conv = conv1x1 if self.stride == 1 else conv3x3
            identity = conv(self.planes, self.stride, use_bias,
                            "downsample_conv", self.dtype)(x)
            identity = maybe_norm(identity, "downsample_bn")

        return leaky_relu02(out + identity)


class DoubleBasicBlock(nn.Module):
    """Two chained BasicBlocks (`modules/networks.py:13-17`)."""
    planes: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BasicBlock(self.planes, dtype=self.dtype, name="block0")(x, train)
        x = BasicBlock(self.planes, dtype=self.dtype, name="block1")(x, train)
        return x


class MLP(nn.Module):
    """Dense stack with LeakyReLU(0.01) activations, final layer linear
    when `disable_final_activation` (`modules/networks.py:129-147`)."""
    channel_list: Sequence[int]
    disable_final_activation: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.channel_list)
        for i, ch in enumerate(self.channel_list):
            x = nn.Dense(ch, name=f"dense{i}", dtype=self.dtype)(x)
            last = i == n - 1
            if not (last and self.disable_final_activation):
                x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return x
