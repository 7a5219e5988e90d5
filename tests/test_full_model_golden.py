"""Full-model golden test: the ENTIRE reference DepthModel forward in
torch vs our Flax stack, through the checkpoint converter.

Assembles the per-module torch replicas (EfficientNetV2-S backbone,
antialiased-ResNet matching encoder, metadata FeatureVolumeManager,
CVEncoder, UNet++ DepthDecoderPP — each individually parity-tested
elsewhere) into the reference `DepthModel.forward` composition
(`/root/reference/experiment_modules/depth_model.py:247-407`): fp32
relative poses, image-prior features on the reference frame, batched
matching features, metadata cost volume at matching scale 1, CV encoder
over scales >= 1, UNet++ decode, log-depth at 4 scales. Random weights
are exported with Lightning state_dict names, converted via
`convert_reference_checkpoint`, and our `DepthModel.apply` must
reproduce all four `log_depth_pred_s{i}` maps. One assertion that fails
if any module, the composition order, or any converter mapping drifts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from simplerecon_tpu.models.depth_model import DepthModel
from simplerecon_tpu.ops import cost_volume as cv_ops
from simplerecon_tpu.utils.convert_reference_checkpoint import (
    convert_state_dict, merge_params)
from test_cv_torch_golden import _torch_reference_volume
from test_efficientnet_torch_parity import TorchEffnetV2S
from test_torch_parity import TorchMatchingEncoder

torch.manual_seed(3)

B, K_SRC, H, W = 1, 2, 64, 96            # k=2 source views
D_BINS, MIN_D, MAX_D = 8, 0.25, 5.0
MH, MW = H // 4, W // 4                  # matching scale 1


def _upsample(x):
    """Reference `upsample` (`utils/generic_utils.py:96-105`): nearest 2x."""
    return F.interpolate(x, scale_factor=2, mode="nearest")


class RefBasicBlock(tnn.Module):
    """Reference BasicBlock with the Identity-norm default — conv bias ON,
    LeakyReLU(0.2), downsample 1x1 (stride 1) / 3x3 (stride 2)
    (`/root/reference/modules/layers.py:24-85`)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=True)
        if cin == cout and stride == 1:
            self.downsample = None
        else:
            conv = (tnn.Conv2d(cin, cout, 1, 1, bias=True) if stride == 1
                    else tnn.Conv2d(cin, cout, 3, stride, 1, bias=True))
            self.downsample = tnn.Sequential(conv, tnn.Identity())

    def forward(self, x):
        out = F.leaky_relu(self.conv1(x), 0.2)
        out = self.conv2(out)
        identity = x if self.downsample is None else self.downsample(x)
        return F.leaky_relu(out + identity, 0.2)


class TorchCVEncoder(tnn.Module):
    """Reference CVEncoder (`modules/networks.py:99-127`)."""

    def __init__(self, num_ch_cv, num_ch_enc, num_ch_outs):
        super().__init__()
        self.convs = tnn.ModuleDict()
        self.num_blocks = len(num_ch_outs)
        for i in range(self.num_blocks):
            cin = num_ch_cv if i == 0 else num_ch_outs[i - 1]
            cout = num_ch_outs[i]
            self.convs[f"ds_conv_{i}"] = RefBasicBlock(
                cin, cout, stride=1 if i == 0 else 2)
            self.convs[f"conv_{i}"] = tnn.Sequential(
                RefBasicBlock(num_ch_enc[i] + cout, cout),
                RefBasicBlock(cout, cout))

    def forward(self, x, img_feats):
        outputs = []
        for i in range(self.num_blocks):
            x = self.convs[f"ds_conv_{i}"](x)
            x = torch.cat([x, img_feats[i]], dim=1)
            x = self.convs[f"conv_{i}"](x)
            outputs.append(x)
        return outputs


class TorchDepthDecoderPP(tnn.Module):
    """Reference DepthDecoderPP incl. its `outputs[::-1]` column
    bookkeeping and per-column depth-head overwrites
    (`modules/networks.py:20-96`)."""

    def __init__(self, num_ch_enc, num_ch_dec=(64, 64, 128, 256)):
        super().__init__()
        self.num_ch_dec = num_ch_dec
        self.convs = tnn.ModuleDict()
        for j in range(1, 5):
            for i in range(4 - j, -1, -1):
                cout = num_ch_dec[i]
                total = 0
                cin = num_ch_enc[i + 1] if j == 1 else num_ch_dec[i + 1]
                self.convs[f"diag_conv_{i + 1}{j - 1}"] = RefBasicBlock(
                    cin, cout)
                total += cout
                cin = num_ch_enc[i] if j == 1 else num_ch_dec[i]
                self.convs[f"right_conv_{i}{j - 1}"] = RefBasicBlock(
                    cin, cout)
                total += cout
                if i + j != 4:
                    self.convs[f"up_conv_{i + 1}{j}"] = RefBasicBlock(
                        num_ch_dec[i + 1], cout)
                    total += cout
                self.convs[f"in_conv_{i}{j}"] = tnn.Sequential(
                    RefBasicBlock(total, cout), RefBasicBlock(cout, cout))
                self.convs[f"output_{i}"] = tnn.Sequential(
                    RefBasicBlock(cout, cout) if i != 0 else tnn.Identity(),
                    tnn.Conv2d(cout, 1, 1))

    def forward(self, input_features):
        prev_outputs = list(input_features)
        outputs = []
        depth_outputs = {}
        for j in range(1, 5):
            for i in range(4 - j, -1, -1):
                inputs = [self.convs[f"right_conv_{i}{j - 1}"](
                    prev_outputs[i])]
                inputs += [_upsample(self.convs[f"diag_conv_{i + 1}{j - 1}"](
                    prev_outputs[i + 1]))]
                if i + j != 4:
                    inputs += [_upsample(self.convs[f"up_conv_{i + 1}{j}"](
                        outputs[-1]))]
                output = self.convs[f"in_conv_{i}{j}"](
                    torch.cat(inputs, dim=1))
                outputs += [output]
                depth_outputs[f"log_depth_pred_s{i}_b1hw"] = \
                    self.convs[f"output_{i}"](output)
            prev_outputs = outputs[::-1]
        return depth_outputs


class TorchMLPNames(tnn.Module):
    """MLP with reference state names cost_volume.mlp.net.{0,2,4}
    (`modules/networks.py:129-147`)."""

    def __init__(self, channels):
        super().__init__()
        layers = []
        for i in range(len(channels) - 1):
            layers.append(tnn.Linear(channels[i], channels[i + 1]))
            layers.append(tnn.LeakyReLU(inplace=True))
        self.net = tnn.Sequential(*layers[:-1])


class TorchDepthModel(tnn.Module):
    """Reference DepthModel attribute layout -> Lightning state names."""

    def __init__(self, mlp_in_ch):
        super().__init__()
        self.encoder = TorchEffnetV2S()
        self.matching_model = TorchMatchingEncoder(num_ch_out=16)
        cv = tnn.Module()
        cv.mlp = TorchMLPNames([mlp_in_ch, 128, 128, 1])
        self.cost_volume = cv
        enc_ch = [24, 48, 64, 160, 256]
        self.cost_volume_net = TorchCVEncoder(
            num_ch_cv=D_BINS, num_ch_enc=enc_ch[1:],
            num_ch_outs=[64, 128, 256, 384])
        self.depth_decoder = TorchDepthDecoderPP(
            num_ch_enc=enc_ch[:1] + [64, 128, 256, 384])

    def forward(self, cur_image, src_image_bk3hw, extr, poses, src_K,
                cur_invK, planes_bd):
        # image-prior + matching features
        cur_feats = self.encoder(cur_image)
        b, k = src_image_bk3hw.shape[:2]
        all_images = torch.cat([cur_image.unsqueeze(1), src_image_bk3hw],
                               dim=1).reshape(b * (k + 1), 3, H, W)
        mf = self.matching_model(all_images).reshape(b, k + 1, 16, MH, MW)
        matching_cur, matching_src = mf[:, 0], mf[:, 1:]

        mlp_params = [(lin.weight, lin.bias)
                      for lin in self.cost_volume.mlp.net
                      if isinstance(lin, tnn.Linear)]
        vol_bdhw = _torch_reference_volume(
            matching_cur, matching_src, extr, poses, src_K, cur_invK,
            planes_bd, mlp_params)

        cv_feats = self.cost_volume_net(vol_bdhw, cur_feats[1:])
        return self.depth_decoder(cur_feats[:1] + cv_feats)


def _geometry():
    rng = np.random.RandomState(21)

    def rot(ax, t):
        cs, sn = np.cos(t), np.sin(t)
        m = np.eye(4, dtype=np.float64)
        i, j = [(1, 2), (0, 2), (0, 1)][ax]
        m[i, i] = m[j, j] = cs
        m[i, j] = sn
        m[j, i] = -sn
        return m

    world_T_cur = rot(1, 0.02)
    world_T_cur[:3, 3] = (0.05, -0.02, 0.01)
    world_T_src = []
    for vi in range(K_SRC):
        m = rot(0, 0.04 * (vi - 0.5)) @ rot(1, 0.06 * (vi + 1))
        m[:3, 3] = rng.uniform(-0.15, 0.15, 3)
        world_T_src.append(m)
    world_T_src = np.stack(world_T_src)[None]

    Kmat = np.eye(4)
    Kmat[0, 0], Kmat[1, 1] = MW * 0.9, MH * 1.1
    Kmat[0, 2], Kmat[1, 2] = MW / 2 - 0.4, MH / 2 + 0.3
    return (world_T_cur[None].astype(np.float64), world_T_src,
            np.broadcast_to(Kmat, (B, K_SRC, 4, 4)).copy(),
            np.linalg.inv(Kmat)[None].copy())


def test_full_depth_model_matches_torch_reference_replica():
    tm = TorchDepthModel(mlp_in_ch=16 * (1 + K_SRC) + (1 + K_SRC)
                         + 3 * (1 + K_SRC) + K_SRC * 4 + 2 * K_SRC).eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(9)
    cur_img = rng.randn(B, 3, H, W).astype(np.float32)
    src_img = rng.randn(B, K_SRC, 3, H, W).astype(np.float32)
    world_T_cur, world_T_src, src_K, cur_invK = _geometry()
    cur_cam_T_world = np.linalg.inv(world_T_cur)
    src_cam_T_world = np.linalg.inv(world_T_src)

    # fp32 relative transforms (`depth_model.py:324-332`)
    src_cam_T_cur_cam = (src_cam_T_world @ world_T_cur[:, None]
                         ).astype(np.float32)
    cur_cam_T_src_cam = (cur_cam_T_world[:, None] @ world_T_src
                         ).astype(np.float32)
    src_K = src_K.astype(np.float32)
    cur_invK = cur_invK.astype(np.float32)
    planes = np.asarray(cv_ops.generate_depth_planes(
        B, D_BINS, MIN_D, MAX_D)).copy()

    with torch.no_grad():
        want = tm(torch.from_numpy(cur_img), torch.from_numpy(src_img),
                  torch.from_numpy(src_cam_T_cur_cam),
                  torch.from_numpy(cur_cam_T_src_cam),
                  torch.from_numpy(src_K), torch.from_numpy(cur_invK),
                  torch.from_numpy(planes))

    # ---- convert the full state_dict (no prefix: Lightning layout) ----
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats, report = convert_state_dict(sd)
    # blur-pool `filt` is a constant binomial filter buffer, not a weight
    leftover = [k for k in report["skipped"]
                if not (k.endswith("num_batches_tracked")
                        or k.endswith(".filt"))]
    assert leftover == [], f"converter dropped tensors: {leftover}"

    fm = DepthModel(image_height=H, image_width=W,
                    matching_num_depth_bins=D_BINS,
                    min_matching_depth=MIN_D, max_matching_depth=MAX_D,
                    model_num_views=K_SRC + 1,
                    cost_volume_backend="xla_fused",
                    dtype=jnp.float32)
    cur_data = {
        "image_b3hw": jnp.asarray(cur_img),
        "invK_s1_b44": jnp.asarray(cur_invK),
        "cam_T_world_b44": jnp.asarray(cur_cam_T_world, jnp.float32),
        "world_T_cam_b44": jnp.asarray(world_T_cur, jnp.float32),
    }
    src_data = {
        "image_b3hw": jnp.asarray(src_img),
        "K_s1_b44": jnp.asarray(src_K),
        "cam_T_world_b44": jnp.asarray(src_cam_T_world, jnp.float32),
        "world_T_cam_b44": jnp.asarray(world_T_src, jnp.float32),
    }
    with jax.default_matmul_precision("highest"):
        variables = fm.init(jax.random.PRNGKey(0), cur_data, src_data,
                            flip=False, train=False)
        merged_p = merge_params(
            jax.tree_util.tree_map(np.asarray, variables["params"]),
            params)
        merged_s = merge_params(
            jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
            stats)
        got = fm.apply({"params": merged_p, "batch_stats": merged_s},
                       cur_data, src_data, flip=False, train=False)

    for i in range(4):
        ours = np.asarray(got[f"log_depth_pred_s{i}_bhw1"]
                          ).transpose(0, 3, 1, 2)
        ref = want[f"log_depth_pred_s{i}_b1hw"].numpy()
        assert ours.shape == ref.shape, (i, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3,
                                   err_msg=f"log_depth_pred_s{i}")
