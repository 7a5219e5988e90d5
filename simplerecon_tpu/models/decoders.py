"""Cost-volume encoder and UNet++ depth decoder (Flax / NHWC).

Re-designs `CVEncoder` (`modules/networks.py:99-127`) and `DepthDecoderPP`
(`modules/networks.py:20-96`). The decoder is the reference's UNet++-style
grid: rows i are encoder depths (0 = finest), columns j are decoder steps;
node (i, j) fuses a "right" edge from (i, j-1), an upsampled "diag" edge
from (i+1, j-1) and — except at each column's top — an upsampled "up" edge
from (i+1, j). A single shared 1x1 head per row emits log-depth at that
row's scale; the final maps come from each row's last column (j = 4 - i),
which is exactly the value the reference's overwrite-per-column loop
returns (`modules/networks.py:75-96`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from simplerecon_tpu.models.layers import BasicBlock, DoubleBasicBlock
from simplerecon_tpu.ops.sampling import upsample2x


class CVEncoder(nn.Module):
    """Encodes the cost volume together with multi-scale image features.

    Block i: strided BasicBlock on the running features, concat the image
    features at that scale, then two BasicBlocks (`modules/networks.py:99-127`).
    """
    num_ch_outs: Sequence[int] = (64, 128, 256, 384)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, cost_volume_bhwd: jnp.ndarray,
                 img_feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        x = cost_volume_bhwd
        outputs = []
        for i, ch in enumerate(self.num_ch_outs):
            x = BasicBlock(ch, stride=1 if i == 0 else 2, dtype=self.dtype,
                           name=f"ds_conv_{i}")(x, train)
            x = jnp.concatenate([x, img_feats[i].astype(x.dtype)], axis=-1)
            x = BasicBlock(ch, dtype=self.dtype, name=f"conv_{i}a")(x, train)
            x = BasicBlock(ch, dtype=self.dtype, name=f"conv_{i}b")(x, train)
            outputs.append(x)
        return outputs


class DepthDecoderPP(nn.Module):
    """UNet++ grid decoder -> log-depth at 4 scales.

    Input: 5 feature maps, finest (stride 2) first. Output dict keys follow
    the reference: `log_depth_pred_s{i}_b1hw` for i in 0..3 — here shaped
    (b, h_i, w_i, 1) NHWC.
    """
    num_ch_dec: Sequence[int] = (64, 64, 128, 256)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        row_latest = list(input_features)  # rows 0..4, finest first
        depth_outputs: Dict[str, jnp.ndarray] = {}

        for j in range(1, 5):
            prev = list(row_latest)  # column snapshot
            max_i = 4 - j
            below = None  # node output of row i+1 in THIS column
            for i in range(max_i, -1, -1):
                ch = self.num_ch_dec[i]
                inputs = [
                    BasicBlock(ch, dtype=self.dtype,
                               name=f"right_conv_{i}{j - 1}")(prev[i], train),
                    upsample2x(
                        BasicBlock(ch, dtype=self.dtype,
                                   name=f"diag_conv_{i + 1}{j - 1}")(
                            prev[i + 1], train)),
                ]
                if i + j != 4:
                    inputs.append(upsample2x(
                        BasicBlock(ch, dtype=self.dtype,
                                   name=f"up_conv_{i + 1}{j}")(below, train)))

                node = DoubleBasicBlock(
                    ch, dtype=self.dtype, name=f"in_conv_{i}{j}")(
                        jnp.concatenate(inputs, axis=-1), train)
                row_latest[i] = node
                below = node

                if j == 4 - i:  # this row's final column -> emit depth
                    h = node
                    if i != 0:
                        h = BasicBlock(ch, dtype=self.dtype,
                                       name=f"output_{i}_block")(h, train)
                    log_depth = nn.Conv(1, (1, 1), use_bias=True,
                                        name=f"output_{i}_conv",
                                        dtype=self.dtype)(h)
                    depth_outputs[f"log_depth_pred_s{i}_b1hw"] = log_depth

        return depth_outputs
