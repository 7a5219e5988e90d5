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
    then depthwise conv stride 2.
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


class _ResNetBasicBlock(nn.Module):
    """Standard torchvision BasicBlock: BN + ReLU, bias-free convs."""
    planes: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        identity = x
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv1", dtype=self.dtype)(x)
        out = jax.nn.relu(bn(out, "bn1"))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2", dtype=self.dtype)(out)
        out = bn(out, "bn2")
        return jax.nn.relu(out + identity)


class ResnetMatchingEncoder(nn.Module):
    """ResNet-18-stem matching encoder -> `num_ch_out` feats at 1/4 res."""
    num_ch_out: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image_bhw3: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1", dtype=self.dtype)(image_bhw3)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        # anti-aliased max-pool: dense 2x2/1 max then blur-pool stride 2
        x = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = _blur_pool_4tap(x)
        x = _ResNetBasicBlock(64, dtype=self.dtype, name="layer1_0")(x, train)
        x = _ResNetBasicBlock(64, dtype=self.dtype, name="layer1_1")(x, train)

        # projection head (`modules/networks.py:189-202`)
        x = conv1x1(128, use_bias=True, name="head_conv1",
                    dtype=self.dtype)(x)
        x = instance_norm(x.astype(jnp.float32)).astype(x.dtype)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
        x = nn.Conv(self.num_ch_out, (3, 3), padding="VALID", use_bias=True,
                    name="head_conv2", dtype=self.dtype)(xp)
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)


class _InvertedResidual(nn.Module):
    """MobileNet-style inverted residual (depthwise separable) block —
    the building block of the mnasnet backbone the reference's
    `UNetMatchingEncoder` uses (`modules/networks.py:207-228`)."""
    planes: int
    stride: int = 1
    expansion: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        mid = x.shape[-1] * self.expansion
        h = nn.Conv(mid, (1, 1), use_bias=False, name="expand",
                    dtype=self.dtype)(x)
        h = jax.nn.relu(bn(h, "bn0"))
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, name="dw", dtype=self.dtype)(h)
        h = jax.nn.relu(bn(h, "bn1"))
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="project",
                    dtype=self.dtype)(h)
        h = bn(h, "bn2")
        if self.stride == 1 and x.shape[-1] == self.planes:
            h = h + x
        return h


class UNetMatchingEncoder(nn.Module):
    """FPN matching encoder (`modules/networks.py:207-228`): a light
    mnasnet-style pyramid + top-down FPN(32) + the same projection head,
    producing `num_ch_out` features at 1/4 input resolution. The slower /
    more accurate `matching_encoder_type: unet_encoder` option."""
    num_ch_out: int = 16
    fpn_channels: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, image_bhw3: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)(h)

        # bottom-up pyramid: strides 2, 4, 8, 16
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem", dtype=self.dtype)(image_bhw3)
        x = jax.nn.relu(bn(x, "stem_bn"))
        c1 = _InvertedResidual(16, 1, 1, self.dtype, name="b1")(x, train)
        c2 = _InvertedResidual(24, 2, 3, self.dtype, name="b2")(c1, train)
        c2 = _InvertedResidual(24, 1, 3, self.dtype, name="b2b")(c2, train)
        c3 = _InvertedResidual(40, 2, 3, self.dtype, name="b3")(c2, train)
        c3 = _InvertedResidual(40, 1, 3, self.dtype, name="b3b")(c3, train)
        c4 = _InvertedResidual(96, 2, 6, self.dtype, name="b4")(c3, train)
        c4 = _InvertedResidual(96, 1, 6, self.dtype, name="b4b")(c4, train)

        # top-down FPN to 1/4 resolution
        f = self.fpn_channels
        p4 = conv1x1(f, use_bias=True, name="lat4", dtype=self.dtype)(c4)
        p3 = conv1x1(f, use_bias=True, name="lat3", dtype=self.dtype)(c3) \
            + jax.image.resize(p4, (p4.shape[0],) + c3.shape[1:3] + (f,),
                               "nearest")
        p2 = conv1x1(f, use_bias=True, name="lat2", dtype=self.dtype)(c2) \
            + jax.image.resize(p3, (p3.shape[0],) + c2.shape[1:3] + (f,),
                               "nearest")
        p2 = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                     name="smooth2", dtype=self.dtype)(p2)

        # projection head, as in the resnet variant
        x = jax.nn.leaky_relu(p2, negative_slope=0.2)
        x = conv1x1(self.num_ch_out, use_bias=True, name="head_conv",
                    dtype=self.dtype)(x)
        return instance_norm(x.astype(jnp.float32)).astype(x.dtype)
