"""The full SimpleRecon depth model as a single Flax module.

Re-designs `DepthModel` (`experiment_modules/depth_model.py:68-407`) —
image-prior encoder + matching encoder + plane-sweep cost volume + CV
encoder + UNet++ decoder — as one jittable forward pass.

Layout: the public API takes the reference's batch-dict schema with images
as (b, 3, h, w) / (b, k, 3, h, w) and transposes to NHWC once at the
device boundary; all internal compute is NHWC.

Flip augmentation reproduces the reference's careful discipline
(`experiment_modules/depth_model.py:260-268, 336-399`): images are flipped
before the encoders, matching features are flipped *back* before the cost
volume (MVS must see geometrically-correct features), the cost volume
output is flipped to re-align with the flipped image-prior features, and
final depth maps are flipped back. `flip` is a traced boolean so one
compiled program serves both branches.

Unlike the torch reference there is no `unbatched_matching_encoder_forward`
inference workaround: the XLA matching encoder is deterministic and
batch-size invariant by construction (cf. `/root/reference/test.py:16-25`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simplerecon_tpu.models.cost_volume import (DotProductCostVolume,
                                                MLPFeatureVolume)
from simplerecon_tpu.models.decoders import CVEncoder, DepthDecoderPP
from simplerecon_tpu.models.efficientnet import EfficientNetV2Features
from simplerecon_tpu.models.matching_encoder import (ResnetMatchingEncoder,
                                                     UNetMatchingEncoder)


def _flip_w(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.flip(x, axis=axis)


def _maybe_flip(flag, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Width-flip selected by a traced boolean."""
    return jnp.where(flag, jnp.flip(x, axis=axis), x)


class DepthModel(nn.Module):
    """SimpleRecon depth network.

    Attributes mirror the reference options (`options.py:106-142`).
    """
    image_height: int = 384
    image_width: int = 512
    matching_scale: int = 1
    matching_num_depth_bins: int = 64
    min_matching_depth: float = 0.25
    max_matching_depth: float = 5.0
    matching_feature_dims: int = 16
    matching_norm: str = "batch"  # "batch" | "group" (eval-lag ablation)
    # stem pool: "reference" (unfused XLA) | "pallas" (fused VMEM kernel,
    # ops/pallas_pool.py) | "fused" (separable slice form, kept for A/B)
    matching_pool_impl: str = "reference"
    model_num_views: int = 8
    feature_volume_type: str = "mlp_feature_volume"
    matching_encoder_type: str = "resnet"  # "resnet" | "unet_encoder"
    cv_encoder_ch: Tuple[int, ...] = (64, 128, 256, 384)
    plane_chunk: int = 8
    remat_cost_volume: bool = True
    # "xla" (banded MXU matmul sweep, chunked+remat — fastest measured
    # path for both training and inference) | "pallas" (fully fused
    # warp+metadata+MLP kernel) | "pallas_v1" (XLA warp + metadata/MLP
    # kernel)
    cost_volume_backend: str = "xla"
    cost_volume_band_axis: str = "x"
    # custom VJP for the fused sweep (see MLPFeatureVolume.custom_vjp):
    # "pallas_bwd" (fwd AND bwd as banded Pallas kernels — fastest and
    # the most accurate bf16 gradients, fp32 in-kernel accumulation) |
    # "pallas" (kernel primal + hand-written XLA backward) | True
    # (hand-written XLA backward, XLA forward) | False (checkpointed
    # autodiff — GSPMD-partitionable; the pallas variants run under
    # shard_map on >1-device meshes, see make_sharded_train_step).
    cost_volume_custom_vjp: object = "pallas_bwd"
    # rematerialize the big submodules in the backward pass. OFF by
    # default: with the warp scan already per-step checkpointed, the
    # remaining activations fit at batch 16 on one 16 GB chip, and
    # skipping the replay saves ~83 ms/step (1322 -> 1239 ms measured).
    # Re-enable for larger per-chip batches.
    remat_submodules: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        def maybe_remat(cls, static_argnums):
            # static_argnums counts `self` as 0
            return (nn.remat(cls, static_argnums=static_argnums)
                    if self.remat_submodules else cls)

        self.encoder = maybe_remat(EfficientNetV2Features, (2,))(
            dtype=self.dtype, name="encoder")
        if self.matching_encoder_type == "unet_encoder":
            self.matching_model = maybe_remat(UNetMatchingEncoder, (2,))(
                num_ch_out=self.matching_feature_dims, dtype=self.dtype,
                name="matching_model")
        else:
            self.matching_model = maybe_remat(ResnetMatchingEncoder, (2,))(
                num_ch_out=self.matching_feature_dims,
                norm=self.matching_norm,
                pool_impl=self.matching_pool_impl, dtype=self.dtype,
                name="matching_model")
        if self.feature_volume_type == "simple_cost_volume":
            self.cost_volume = DotProductCostVolume(
                num_depth_bins=self.matching_num_depth_bins,
                min_depth=self.min_matching_depth,
                max_depth=self.max_matching_depth,
                backend=self.cost_volume_backend, dtype=self.dtype,
                name="cost_volume")
        elif self.feature_volume_type == "mlp_feature_volume":
            self.cost_volume = MLPFeatureVolume(
                num_depth_bins=self.matching_num_depth_bins,
                min_depth=self.min_matching_depth,
                max_depth=self.max_matching_depth,
                matching_dim_size=self.matching_feature_dims,
                num_source_views=self.model_num_views - 1,
                plane_chunk=self.plane_chunk, remat=self.remat_cost_volume,
                backend=self.cost_volume_backend,
                band_axis=self.cost_volume_band_axis,
                custom_vjp=self.cost_volume_custom_vjp,
                dtype=self.dtype, name="cost_volume")
        else:
            raise ValueError(self.feature_volume_type)
        def maybe_remat2(cls, static_argnums):
            return (nn.remat(cls, static_argnums=static_argnums)
                    if self.remat_submodules else cls)

        self.cost_volume_net = maybe_remat2(CVEncoder, (3,))(
            num_ch_outs=self.cv_encoder_ch, dtype=self.dtype,
            name="cost_volume_net")
        self.depth_decoder = maybe_remat2(DepthDecoderPP, (2,))(
            dtype=self.dtype, name="depth_decoder")

    def __call__(self, cur_data: Dict[str, jnp.ndarray],
                 src_data: Dict[str, jnp.ndarray],
                 flip: jnp.ndarray | bool = False,
                 train: bool = False,
                 return_mask: bool = False) -> Dict[str, jnp.ndarray]:
        """Forward pass.

        Args:
            cur_data: reference-view tensors: `image_b3hw` (b, 3, h, w),
                `invK_s{m}_b44`, `cam_T_world_b44`, `world_T_cam_b44`.
            src_data: source-view tensors with a views axis:
                `image_b3hw` (b, k, 3, h, w), `K_s{m}_b44` (b, k, 4, 4),
                `cam_T_world_b44`, `world_T_cam_b44` (b, k, 4, 4).
            flip: traced bool — apply the train-time horizontal flip.
            train: enables BatchNorm batch statistics.
            return_mask: also compute the source-visibility mask.

        Returns:
            dict with `log_depth_pred_s{i}_bhw1` / `depth_pred_s{i}_bhw1`
            for i in 0..3 (s0 = half input resolution), `lowest_cost_bhw`,
            and `overall_mask_bhw` (None unless return_mask).
        """
        m = self.matching_scale
        cur_image = jnp.transpose(cur_data["image_b3hw"], (0, 2, 3, 1)
                                  ).astype(self.dtype)
        src_image = jnp.transpose(src_data["image_b3hw"], (0, 1, 3, 4, 2)
                                  ).astype(self.dtype)
        b, k = src_image.shape[:2]

        src_K = src_data[f"K_s{m}_b44"]
        cur_invK = cur_data[f"invK_s{m}_b44"]

        # relative transforms in fp32 (`depth_model.py:324-332`)
        src_cam_T_world = src_data["cam_T_world_b44"].astype(jnp.float32)
        src_world_T_cam = src_data["world_T_cam_b44"].astype(jnp.float32)
        cur_cam_T_world = cur_data["cam_T_world_b44"].astype(jnp.float32)
        cur_world_T_cam = cur_data["world_T_cam_b44"].astype(jnp.float32)
        src_cam_T_cur_cam = src_cam_T_world @ cur_world_T_cam[:, None]
        cur_cam_T_src_cam = cur_cam_T_world[:, None] @ src_world_T_cam

        flip = jnp.asarray(flip)
        cur_image = _maybe_flip(flip, cur_image, axis=2)
        src_image = _maybe_flip(flip, src_image, axis=3)

        # image-prior features on the (possibly flipped) reference image
        cur_feats = self.encoder(cur_image, train)  # positional: remat static_argnums

        # matching features for all views in one batched pass
        all_images = jnp.concatenate([cur_image[:, None], src_image], axis=1)
        hw = all_images.shape[2:4]
        matching_feats = self.matching_model(
            all_images.reshape(b * (k + 1), *hw, 3), train)
        mh, mw, mc = matching_feats.shape[1:]
        matching_feats = matching_feats.reshape(b, k + 1, mh, mw, mc)
        # flip matching features BACK for geometrically-correct MVS
        matching_feats = _maybe_flip(flip, matching_feats, axis=3)
        matching_cur = matching_feats[:, 0]
        matching_src = matching_feats[:, 1:]

        cost_volume, lowest_cost, _, overall_mask = self.cost_volume(
            matching_cur, matching_src,
            src_extrinsics_bk44=src_cam_T_cur_cam,
            src_poses_bk44=cur_cam_T_src_cam,
            src_Ks_bk44=src_K.astype(jnp.float32),
            cur_invK_b44=cur_invK.astype(jnp.float32),
            return_mask=return_mask)

        # re-align the volume with the flipped image-prior features
        cost_volume = _maybe_flip(flip, cost_volume, axis=2
                                  ).astype(self.dtype)

        cv_feats = self.cost_volume_net(cost_volume, cur_feats[m:],
                                        train)
        decoder_inputs = list(cur_feats[:m]) + cv_feats
        outputs = dict(self.depth_decoder(decoder_inputs, train))

        for key in list(outputs.keys()):
            log_depth = outputs[key].astype(jnp.float32)
            log_depth = _maybe_flip(flip, log_depth, axis=2)
            bhw1_key = key.replace("_b1hw", "_bhw1")
            outputs.pop(key)
            outputs[bhw1_key] = log_depth
            # clamp before exp: unsupervised regions (masked-out GT) can
            # drift until exp overflows to inf, which then leaks into
            # gradient/normals losses as NaN. [-8, 8] = [0.3mm, 3km],
            # never binding for real depth.
            outputs[bhw1_key.replace("log_", "")] = jnp.exp(
                jnp.clip(log_depth, -8.0, 8.0))

        outputs["lowest_cost_bhw"] = _maybe_flip(flip, lowest_cost, axis=2)
        outputs["overall_mask_bhw"] = overall_mask
        return outputs


def build_depth_model(opts, dtype=None) -> DepthModel:
    """Constructs a DepthModel from an `Options` object."""
    if dtype is None:
        dtype = jnp.bfloat16 if opts.compute_dtype == "bfloat16" \
            else jnp.float32
    backend = getattr(opts, "cost_volume_backend", "xla")
    cvjp = getattr(opts, "cost_volume_custom_vjp", "pallas_bwd")
    if isinstance(cvjp, str) and cvjp.lower() in ("false", "0", "none",
                                                  "true", "1"):
        # CLI flags arrive as strings; YAML arrives typed
        cvjp = cvjp.lower() in ("true", "1")
    if getattr(opts, "fast_cost_volume", False) and \
            backend.startswith("xla"):
        # the reference's --fast_cost_volume (test.py:196-198) swaps in
        # a faster inference-only cost volume; ours is the banded
        # Pallas kernel (11.4 ms b1 vs 21.5 xla_fused on v5e).
        # Inference-only: pallas_call has no backward pass here.
        backend = "pallas"
    return DepthModel(
        image_height=opts.image_height,
        image_width=opts.image_width,
        matching_scale=opts.matching_scale,
        matching_num_depth_bins=opts.matching_num_depth_bins,
        min_matching_depth=opts.min_matching_depth,
        max_matching_depth=opts.max_matching_depth,
        matching_feature_dims=opts.matching_feature_dims,
        matching_norm=getattr(opts, "matching_norm", "batch"),
        matching_pool_impl=getattr(opts, "matching_pool_impl",
                                   "reference"),
        model_num_views=opts.model_num_views,
        feature_volume_type=opts.feature_volume_type,
        matching_encoder_type=opts.matching_encoder_type,
        cost_volume_backend=backend,
        cost_volume_band_axis=getattr(opts, "cost_volume_band_axis", "x"),
        cost_volume_custom_vjp=cvjp,
        remat_submodules=getattr(opts, "remat_submodules", False),
        dtype=dtype)
