"""Full-backbone torch parity for the EfficientNetV2-S image prior.

The reference's image-prior encoder is timm `tf_efficientnetv2_s_in21ft1k`
with `features_only=True` (`/root/reference/experiment_modules/
depth_model.py:109-117`). Round-2 coverage validated a single MBConv
block; this test replicates the WHOLE feature extractor in torch — stem,
all 40 blocks across the 6 stages (ConvBnAct / EdgeResidual /
InvertedResidual with SE), TF-style asymmetric "SAME" padding on strided
convs, BatchNorm(eps=1e-3) — with timm state_dict names, converts the
weights through `convert_reference_checkpoint`, and asserts all 5
feature taps match our Flax backbone. This is the prerequisite for
trusting the converter the day real pretrained weights arrive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from simplerecon_tpu.models.efficientnet import (EfficientNetV2Features,
                                                 V2_S_CONFIG)
from simplerecon_tpu.utils.convert_reference_checkpoint import (
    convert_state_dict, merge_params)

torch.manual_seed(7)


class Conv2dSame(tnn.Conv2d):
    """TF "SAME" padding (pads more on bottom/right when asymmetric) —
    timm's Conv2dSame, used by every tf_* model for strided convs."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        # pad_total = max((ceil(i/s)-1)*s + k - i, 0), split low/high
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _conv(cin, cout, k, s, groups=1):
    if s > 1:
        return Conv2dSame(cin, cout, k, s, groups=groups, bias=False)
    return tnn.Conv2d(cin, cout, k, s, padding=k // 2, groups=groups,
                      bias=False)


def _bn(ch):
    return tnn.BatchNorm2d(ch, eps=1e-3)


class ConvBnAct(tnn.Module):
    def __init__(self, cin, cout, s):
        super().__init__()
        self.conv = _conv(cin, cout, 3, s)
        self.bn1 = _bn(cout)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        out = F.silu(self.bn1(self.conv(x)))
        return out + x if self.has_skip else out


class EdgeResidual(tnn.Module):
    """timm EdgeResidual (FusedMBConv): fused 3x3 expand + pw-linear."""

    def __init__(self, cin, cout, s, e):
        super().__init__()
        mid = cin * e
        self.conv_exp = _conv(cin, mid, 3, s)
        self.bn1 = _bn(mid)
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn2 = _bn(cout)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        out = F.silu(self.bn1(self.conv_exp(x)))
        out = self.bn2(self.conv_pwl(out))
        return out + x if self.has_skip else out


class SqueezeExcite(tnn.Module):
    def __init__(self, ch, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class InvertedResidual(tnn.Module):
    """timm InvertedResidual: pw expand + dw 3x3 + SE + pw-linear.
    SE reduce channels derive from the block INPUT channels (timm
    rd_ratio applied to in_chs)."""

    def __init__(self, cin, cout, s, e, se_ratio):
        super().__init__()
        mid = cin * e
        self.conv_pw = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = _bn(mid)
        self.conv_dw = _conv(mid, mid, 3, s, groups=mid)
        self.bn2 = _bn(mid)
        self.se = SqueezeExcite(mid, max(1, round(cin * se_ratio)))
        self.conv_pwl = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = _bn(cout)
        self.has_skip = s == 1 and cin == cout

    def forward(self, x):
        out = F.silu(self.bn1(self.conv_pw(x)))
        out = F.silu(self.bn2(self.conv_dw(out)))
        out = self.se(out)
        out = self.bn3(self.conv_pwl(out))
        return out + x if self.has_skip else out


class TorchEffnetV2S(tnn.Module):
    """Whole tf_efficientnetv2_s feature extractor with timm state_dict
    names (conv_stem, bn1, blocks.{s}.{b}.*), feature taps after stages
    0, 1, 2, 4, 5 (strides 2/4/8/16/32, channels 24/48/64/160/256)."""

    def __init__(self):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 24, 3, 2, bias=False)
        self.bn1 = _bn(24)
        blocks = []
        cin = 24
        for (btype, repeats, stride, expand, cout, se) in V2_S_CONFIG:
            stage = []
            for b in range(repeats):
                s = stride if b == 0 else 1
                if btype == "cn":
                    stage.append(ConvBnAct(cin, cout, s))
                elif btype == "er":
                    stage.append(EdgeResidual(cin, cout, s, expand))
                else:
                    stage.append(InvertedResidual(cin, cout, s, expand,
                                                  se))
                cin = cout
            blocks.append(tnn.Sequential(*stage))
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for i, stage in enumerate(self.blocks):
            x = stage(x)
            if i in (0, 1, 2, 4, 5):
                feats.append(x)
        return feats


def test_efficientnetv2s_full_backbone_parity():
    tm = TorchEffnetV2S().eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        want = [f.numpy() for f in tm(x)]

    sd = {f"encoder.{k}": v.numpy() for k, v in tm.state_dict().items()}
    params, stats, report = convert_state_dict(sd)
    leftover = [k for k in report["skipped"]
                if not k.endswith("num_batches_tracked")]
    assert leftover == [], leftover

    fm = EfficientNetV2Features(dtype=jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                        train=False)
    merged_p = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        params["encoder"])
    merged_s = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["batch_stats"]),
        stats["encoder"])
    got = fm.apply({"params": merged_p, "batch_stats": merged_s},
                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   train=False)

    assert len(got) == len(want) == 5
    for i, (g, wnt) in enumerate(zip(got, want)):
        g_nchw = np.asarray(g).transpose(0, 3, 1, 2)
        assert g_nchw.shape == wnt.shape, \
            f"tap {i}: {g_nchw.shape} vs {wnt.shape}"
        np.testing.assert_allclose(g_nchw, wnt, rtol=1e-3, atol=1e-3,
                                   err_msg=f"feature tap {i}")
