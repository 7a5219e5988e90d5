"""Golden parity vs torch for the converter-covered building blocks.

Builds small torch modules with the reference's exact layer structure
and state_dict names, runs them forward, converts the weights with
`convert_reference_checkpoint`, and checks our Flax modules produce the
same outputs. This validates every transpose/name mapping with real
numerics — the de-risking step for loading published reference weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from simplerecon_tpu.models.layers import MLP as FlaxMLP
from simplerecon_tpu.models.matching_encoder import ResnetMatchingEncoder
from simplerecon_tpu.utils.convert_reference_checkpoint import (
    convert_state_dict, merge_params)

torch.manual_seed(0)


def to_np(t):
    return t.detach().numpy()


class TorchMLP(tnn.Module):
    """Reference `modules/networks.py:129-147` structure."""

    def __init__(self, channels=(10, 16, 16, 1)):
        super().__init__()
        layers = []
        for i in range(len(channels) - 1):
            layers.append(tnn.Linear(channels[i], channels[i + 1]))
            layers.append(tnn.LeakyReLU(inplace=True))
        self.net = tnn.Sequential(*layers[:-1])  # final activation off


def test_mlp_parity():
    tm = TorchMLP()
    x = torch.randn(5, 10)
    with torch.no_grad():
        want = to_np(tm.net(x))

    sd = {f"cost_volume.mlp.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats, _ = convert_state_dict(sd)

    fm = FlaxMLP(channel_list=[16, 16, 1], disable_final_activation=True)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((5, 10)))
    merged = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        params["cost_volume"]["mlp"])
    got = np.asarray(fm.apply({"params": merged}, jnp.asarray(to_np(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TorchBlurPool(tnn.Module):
    """antialiased_cnns.BlurPool(filt_size=4, stride=2)."""

    def __init__(self, channels):
        super().__init__()
        a = torch.tensor([1.0, 3.0, 3.0, 1.0])
        filt = (a[:, None] * a[None, :])
        filt = filt / filt.sum()
        self.register_buffer("filt",
                             filt[None, None].repeat(channels, 1, 1, 1))
        self.channels = channels
        self.pad = tnn.ReflectionPad2d((1, 2, 1, 2))

    def forward(self, x):
        return tnn.functional.conv2d(self.pad(x), self.filt, stride=2,
                                     groups=self.channels)


class TorchMatchingEncoder(tnn.Module):
    """Reference `ResnetMatchingEncoder` structure + state_dict names
    (`modules/networks.py:149-205`): net.0 conv1, net.1 bn1, net.4
    layer1 (2 torchvision BasicBlocks), net.5 1x1, net.8 3x3."""

    def __init__(self, num_ch_out=16):
        super().__init__()

        def basic_block():
            b = tnn.Module()
            b.conv1 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
            b.bn1 = tnn.BatchNorm2d(64)
            b.conv2 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
            b.bn2 = tnn.BatchNorm2d(64)
            return b

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.conv2 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
                self.bn2 = tnn.BatchNorm2d(64)

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                return torch.relu(out + x)

        maxpool = tnn.Sequential(
            tnn.MaxPool2d(kernel_size=2, stride=1),
            TorchBlurPool(64))
        self.net = tnn.Sequential(
            tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),  # 0
            tnn.BatchNorm2d(64),                                    # 1
            tnn.ReLU(inplace=True),                                 # 2
            maxpool,                                                # 3
            tnn.Sequential(Block(), Block()),                       # 4
            tnn.Conv2d(64, 128, 1),                                 # 5
            tnn.InstanceNorm2d(128),                                # 6
            tnn.LeakyReLU(0.2, True),                               # 7
            tnn.Conv2d(128, num_ch_out, 3, padding=1,
                       padding_mode="replicate"),                   # 8
            tnn.InstanceNorm2d(num_ch_out),                         # 9
        )

    def forward(self, x):
        return self.net(x)


def test_matching_encoder_parity():
    tm = TorchMatchingEncoder().eval()
    # randomize BN running stats so the test catches mean/var mapping
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 3, 64, 96)
    with torch.no_grad():
        want = to_np(tm(x))  # (2, 16, 16, 24)

    sd = {f"matching_model.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats, _ = convert_state_dict(sd)

    fm = ResnetMatchingEncoder(num_ch_out=16)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 64, 96, 3)), train=False)
    merged_p = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        params["matching_model"])
    merged_s = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        stats["matching_model"])

    got = np.asarray(fm.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(to_np(x).transpose(0, 2, 3, 1)), train=False))
    got_nchw = got.transpose(0, 3, 1, 2)
    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=1e-4)


class TorchSE(tnn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = tnn.functional.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class TorchMBConv(tnn.Module):
    """timm InvertedResidual (ir) with SE, stride 1, expand 4."""

    def __init__(self, ch=8, expand=4):
        super().__init__()
        mid = ch * expand
        self.conv_pw = tnn.Conv2d(ch, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = tnn.Conv2d(mid, mid, 3, padding=1, groups=mid,
                                  bias=False)
        self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.se = TorchSE(mid, max(1, round(ch * 0.25)))
        self.conv_pwl = tnn.Conv2d(mid, ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ch, eps=1e-3)

    def forward(self, x):
        out = tnn.functional.silu(self.bn1(self.conv_pw(x)))
        out = tnn.functional.silu(self.bn2(self.conv_dw(out)))
        out = self.se(out)
        out = self.bn3(self.conv_pwl(out))
        return out + x


def test_mbconv_parity():
    from simplerecon_tpu.models.efficientnet import _MBConv

    tm = TorchMBConv().eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 8, 12, 16)
    with torch.no_grad():
        want = to_np(tm(x))

    # state names as in the Lightning checkpoint: encoder.blocks.3.0.*
    sd = {f"encoder.blocks.3.0.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    # minimal stem keys so the efficientnet section engages
    sd["encoder.conv_stem.weight"] = np.zeros((8, 3, 3, 3), np.float32)
    for stat, shape in (("weight", 8), ("bias", 8),
                        ("running_mean", 8), ("running_var", 8)):
        sd[f"encoder.bn1.{stat}"] = (np.ones(shape, np.float32)
                                     if "var" in stat or "weight" in stat
                                     else np.zeros(shape, np.float32))
    params, stats, _ = convert_state_dict(sd)

    fm = _MBConv(features=8, stride=1, expand=4, se_ratio=0.25)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((2, 12, 16, 8)),
                        train=False)
    merged_p = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        params["encoder"]["stage3_block0"])
    merged_s = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        stats["encoder"]["stage3_block0"])
    got = np.asarray(fm.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(to_np(x).transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=1e-4)


class TorchMnasIRBlock(tnn.Module):
    """timm InvertedResidual (mnasnet_100) structure + state_dict names."""

    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv_dw = tnn.Conv2d(mid, mid, k, s, k // 2, groups=mid,
                                  bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv_pw(x)))
        h = torch.relu(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_skip else h


class TorchMnasDs(tnn.Module):
    """timm DepthwiseSeparableConv (mnasnet blocks.0.0)."""

    def __init__(self, cin=32, cout=16):
        super().__init__()
        self.conv_dw = tnn.Conv2d(cin, cin, 3, 1, 1, groups=cin, bias=False)
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv_pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn2(self.conv_pw(torch.relu(self.bn1(self.conv_dw(x)))))


class TorchMnasnetFPNEncoder(tnn.Module):
    """Reference `UNetMatchingEncoder` structure: timm mnasnet_100
    features_only + torchvision 0.11 FeaturePyramidNetwork(out=32) +
    outconv (`modules/networks.py:207-228`). Replicated module-by-module
    (timm/torchvision are not installed in this environment; layer specs
    follow timm `_gen_mnasnet_b1` and torchvision 0.11.1 `fpn.py`)."""

    STAGES = [  # (repeats, kernel, stride, expansion, out_ch)
        (3, 3, 2, 3, 24), (3, 5, 2, 3, 40), (3, 5, 2, 6, 80),
        (2, 3, 1, 6, 96), (4, 5, 2, 6, 192), (1, 3, 1, 6, 320)]

    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        enc.conv_stem = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        enc.bn1 = tnn.BatchNorm2d(32)
        blocks = [tnn.Sequential(TorchMnasDs(32, 16))]
        cin = 16
        for (r, k, s, e, cout) in self.STAGES:
            stage = []
            for b in range(r):
                stage.append(TorchMnasIRBlock(cin, cout, k,
                                              s if b == 0 else 1, e))
                cin = cout
            blocks.append(tnn.Sequential(*stage))
        enc.blocks = tnn.Sequential(*blocks)
        self.encoder = enc

        dec = tnn.Module()
        dec.inner_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, 32, 1) for c in (16, 24, 40, 96, 320)])
        dec.layer_blocks = tnn.ModuleList(
            [tnn.Conv2d(32, 32, 3, padding=1) for _ in range(5)])
        self.decoder = dec

        self.outconv = tnn.Sequential(
            tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(32, 16, 1),
            tnn.InstanceNorm2d(16))

    def forward(self, x):
        x = torch.relu(self.encoder.bn1(self.encoder.conv_stem(x)))
        feats = []
        for i, stage in enumerate(self.encoder.blocks):
            x = stage(x)
            if i in (0, 1, 2, 4, 6):
                feats.append(x)
        # torchvision FPN top-down (fpn.py, 0.11.1), feat_1 output
        last_inner = self.decoder.inner_blocks[4](feats[4])
        for idx in (3, 2, 1):
            lateral = self.decoder.inner_blocks[idx](feats[idx])
            top_down = tnn.functional.interpolate(
                last_inner, size=lateral.shape[-2:], mode="nearest")
            last_inner = lateral + top_down
        p1 = self.decoder.layer_blocks[1](last_inner)
        return self.outconv(p1)


def test_unet_matching_encoder_parity():
    from simplerecon_tpu.models.matching_encoder import UNetMatchingEncoder

    tm = TorchMnasnetFPNEncoder().eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 3, 64, 96)
    with torch.no_grad():
        want = to_np(tm(x))  # (2, 16, 16, 24)

    sd = {f"matching_model.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats, report = convert_state_dict(sd)
    # every encoder/decoder-path tensor must be consumed (unused FPN
    # levels 0 excepted)
    leftover = [k for k in report["skipped"]
                if not (".inner_blocks.0." in k
                        or ".layer_blocks." in k and ".layer_blocks.1." not in k
                        or k.endswith("num_batches_tracked"))]
    assert leftover == [], leftover

    fm = UNetMatchingEncoder(num_ch_out=16)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 64, 96, 3)), train=False)
    merged_p = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        params["matching_model"])
    merged_s = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        stats["matching_model"])

    got = np.asarray(fm.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(to_np(x).transpose(0, 2, 3, 1)), train=False))
    got_nchw = got.transpose(0, 3, 1, 2)
    assert got_nchw.shape == want.shape
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=1e-4)
