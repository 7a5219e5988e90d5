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
