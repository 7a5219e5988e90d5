"""Convert reference (PyTorch Lightning) checkpoints to our Flax params.

The reference stores a Lightning `.ckpt` whose `state_dict` holds the
torch `DepthModel` weights (`experiment_modules/depth_model.py:68-189`).
This module maps those tensors onto our Flax module tree so published
weights can validate the whole stack without retraining.

Conventions:
  * torch Conv2d (O, I, kH, kW)  -> flax (kH, kW, I, O)
  * torch depthwise Conv2d (C, 1, kH, kW) -> flax (kH, kW, 1, C)
  * torch Linear (O, I)          -> flax (I, O)
  * torch BatchNorm weight/bias/running_mean/running_var ->
    flax scale/bias + batch_stats mean/var

Covered submodules (torch name -> flax path):
  matching_model.net.*      -> matching_model/* (antialiased ResNet18 stem)
  matching_model.encoder/decoder/outconv.* -> matching_model/*
                               (mnasnet_100 + FPN unet_encoder variant)
  cost_volume.mlp.net.*     -> cost_volume/mlp/dense{0,1,2}
  cost_volume_net.convs.*   -> cost_volume_net/{ds_conv_i, conv_ia, conv_ib}
  depth_decoder.convs.*     -> depth_decoder/* (UNet++ grid)
  encoder.encoder.*         -> encoder/* (timm tf_efficientnetv2_s)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dw_conv(w):  # (C, 1, kH, kW) -> (kH, kW, 1, C)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w):
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def load_torch_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Loads a Lightning .ckpt (or a bare state_dict file) on CPU."""
    import torch
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


class _TreeWriter:
    """Collects (path tuple -> array) assignments into nested dicts."""

    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}
        self.used = set()

    def put(self, tree: Dict, path: Tuple[str, ...], value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, sd, tname, fpath):
        self.put(self.params, fpath + ("kernel",), _conv(sd[tname]))
        self.used.add(tname)
        bias = tname.replace(".weight", ".bias")
        if bias in sd:
            self.put(self.params, fpath + ("bias",), sd[bias])
            self.used.add(bias)

    def linear(self, sd, tprefix, fpath):
        self.put(self.params, fpath + ("kernel",),
                 _linear(sd[f"{tprefix}.weight"]))
        self.put(self.params, fpath + ("bias",), sd[f"{tprefix}.bias"])
        self.used.update({f"{tprefix}.weight", f"{tprefix}.bias"})

    def bn(self, sd, tprefix, fpath):
        self.put(self.params, fpath + ("scale",), sd[f"{tprefix}.weight"])
        self.put(self.params, fpath + ("bias",), sd[f"{tprefix}.bias"])
        self.put(self.batch_stats, fpath + ("mean",),
                 sd[f"{tprefix}.running_mean"])
        self.put(self.batch_stats, fpath + ("var",),
                 sd[f"{tprefix}.running_var"])
        self.used.update({f"{tprefix}.weight", f"{tprefix}.bias",
                          f"{tprefix}.running_mean",
                          f"{tprefix}.running_var"})


def _convert_matching_encoder(sd, w: _TreeWriter):
    """`ResnetMatchingEncoder.net` (`modules/networks.py:149-202`):
    [0]=conv1 [1]=bn1 [4]=layer1 [5]=1x1 conv [8]=3x3 conv."""
    if "matching_model.net.0.weight" not in sd:
        return
    base = ("matching_model",)
    w.conv(sd, "matching_model.net.0.weight", base + ("conv1",))
    w.bn(sd, "matching_model.net.1", base + ("bn1",))
    for b in (0, 1):
        blk = base + (f"layer1_{b}",)
        for c in ("conv1", "conv2"):
            w.conv(sd, f"matching_model.net.4.{b}.{c}.weight", blk + (c,))
        for bn in ("bn1", "bn2"):
            w.bn(sd, f"matching_model.net.4.{b}.{bn}", blk + (bn,))
    w.conv(sd, "matching_model.net.5.weight", base + ("head_conv1",))
    w.conv(sd, "matching_model.net.8.weight", base + ("head_conv2",))


def _convert_unet_matching_encoder(sd, w: _TreeWriter):
    """`UNetMatchingEncoder` (`modules/networks.py:207-228`): timm
    mnasnet_100 (`matching_model.encoder.*`), torchvision 0.11 FPN
    (`matching_model.decoder.{inner,layer}_blocks.*`), and the outconv
    head (`matching_model.outconv.1.*`)."""
    enc = "matching_model.encoder"
    if f"{enc}.conv_stem.weight" not in sd:
        return
    base = ("matching_model",)
    w.conv(sd, f"{enc}.conv_stem.weight", base + ("conv_stem",))
    w.bn(sd, f"{enc}.bn1", base + ("bn1",))
    # blocks.0.0 = depthwise-separable
    t = f"{enc}.blocks.0.0"
    fp = base + ("blocks_0_0",)
    w.conv(sd, f"{t}.conv_dw.weight", fp + ("conv_dw",))
    w.bn(sd, f"{t}.bn1", fp + ("bn1",))
    w.conv(sd, f"{t}.conv_pw.weight", fp + ("conv_pw",))
    w.bn(sd, f"{t}.bn2", fp + ("bn2",))
    # blocks.1..6 = inverted residuals
    for s in range(1, 7):
        b = 0
        while f"{enc}.blocks.{s}.{b}.conv_pw.weight" in sd:
            t = f"{enc}.blocks.{s}.{b}"
            fp = base + (f"blocks_{s}_{b}",)
            w.conv(sd, f"{t}.conv_pw.weight", fp + ("conv_pw",))
            w.bn(sd, f"{t}.bn1", fp + ("bn1",))
            w.conv(sd, f"{t}.conv_dw.weight", fp + ("conv_dw",))
            w.bn(sd, f"{t}.bn2", fp + ("bn2",))
            w.conv(sd, f"{t}.conv_pwl.weight", fp + ("conv_pwl",))
            w.bn(sd, f"{t}.bn3", fp + ("bn3",))
            b += 1
    # FPN: only levels on the feat_1 path exist in our module
    dec = "matching_model.decoder"
    for i in (1, 2, 3, 4):
        if f"{dec}.inner_blocks.{i}.weight" in sd:
            w.conv(sd, f"{dec}.inner_blocks.{i}.weight",
                   base + (f"inner_{i}",))
    if f"{dec}.layer_blocks.1.weight" in sd:
        w.conv(sd, f"{dec}.layer_blocks.1.weight", base + ("layer_1",))
    # outconv head: Sequential [LeakyReLU, Conv2d, InstanceNorm]
    if "matching_model.outconv.1.weight" in sd:
        w.conv(sd, "matching_model.outconv.1.weight", base + ("outconv",))


def _convert_mlp(sd, w: _TreeWriter):
    """`cost_volume.mlp.net` Linear layers (indices 0, 2, 4, ...)."""
    i = 0
    theirs = 0
    while f"cost_volume.mlp.net.{theirs}.weight" in sd:
        w.linear(sd, f"cost_volume.mlp.net.{theirs}",
                 ("cost_volume", "mlp", f"dense{i}"))
        i += 1
        theirs += 2


def _convert_basic_block(sd, w: _TreeWriter, tprefix: str,
                         fpath: Tuple[str, ...]):
    """Norm-free BasicBlock (`modules/layers.py:24-85`): conv1, conv2,
    optional downsample (Sequential index 0 = conv)."""
    w.conv(sd, f"{tprefix}.conv1.weight", fpath + ("conv1",))
    w.conv(sd, f"{tprefix}.conv2.weight", fpath + ("conv2",))
    if f"{tprefix}.downsample.0.weight" in sd:
        w.conv(sd, f"{tprefix}.downsample.0.weight",
               fpath + ("downsample_conv",))
    elif f"{tprefix}.downsample.weight" in sd:
        w.conv(sd, f"{tprefix}.downsample.weight",
               fpath + ("downsample_conv",))


def _convert_cv_encoder(sd, w: _TreeWriter, num_blocks: int = 4):
    if "cost_volume_net.convs.ds_conv_0.conv1.weight" not in sd:
        return
    for i in range(num_blocks):
        _convert_basic_block(sd, w, f"cost_volume_net.convs.ds_conv_{i}",
                             ("cost_volume_net", f"ds_conv_{i}"))
        _convert_basic_block(sd, w, f"cost_volume_net.convs.conv_{i}.0",
                             ("cost_volume_net", f"conv_{i}a"))
        _convert_basic_block(sd, w, f"cost_volume_net.convs.conv_{i}.1",
                             ("cost_volume_net", f"conv_{i}b"))


def _convert_decoder(sd, w: _TreeWriter):
    base = "depth_decoder.convs"
    if f"{base}.right_conv_00.conv1.weight" not in sd:
        return
    for j in range(1, 5):
        for i in range(4 - j, -1, -1):
            _convert_basic_block(sd, w, f"{base}.diag_conv_{i + 1}{j - 1}",
                                 ("depth_decoder",
                                  f"diag_conv_{i + 1}{j - 1}"))
            _convert_basic_block(sd, w, f"{base}.right_conv_{i}{j - 1}",
                                 ("depth_decoder", f"right_conv_{i}{j - 1}"))
            if i + j != 4:
                _convert_basic_block(sd, w, f"{base}.up_conv_{i + 1}{j}",
                                     ("depth_decoder", f"up_conv_{i + 1}{j}"))
            for k, blk in ((0, "block0"), (1, "block1")):
                _convert_basic_block(sd, w, f"{base}.in_conv_{i}{j}.{k}",
                                     ("depth_decoder", f"in_conv_{i}{j}",
                                      blk))
    for i in range(4):
        if f"{base}.output_{i}.0.conv1.weight" in sd:
            _convert_basic_block(sd, w, f"{base}.output_{i}.0",
                                 ("depth_decoder", f"output_{i}_block"))
        w.conv(sd, f"{base}.output_{i}.1.weight",
               ("depth_decoder", f"output_{i}_conv"))


def _convert_efficientnet(sd, w: _TreeWriter):
    """timm tf_efficientnetv2_s (`encoder.encoder` in the reference is
    attribute `encoder`; Lightning keys are `encoder.conv_stem.weight`,
    `encoder.blocks.{s}.{b}.*`). Our stage{si}_block{bi} modules use the
    same leaf names as timm (conv/conv_exp/conv_pw/conv_dw/conv_pwl,
    bn1..bn3, se.conv_reduce/conv_expand)."""
    if "encoder.conv_stem.weight" not in sd:
        return  # checkpoint without the backbone; skip silently
    base = ("encoder",)
    w.conv(sd, "encoder.conv_stem.weight", base + ("conv_stem",))
    w.bn(sd, "encoder.bn1", base + ("bn_stem",))
    for s in range(16):  # stages need not be consecutive in subsets
        if f"encoder.blocks.{s}.0.bn1.weight" not in sd:
            continue
        b = 0
        while f"encoder.blocks.{s}.{b}.bn1.weight" in sd:
            t = f"encoder.blocks.{s}.{b}"
            fpath = base + (f"stage{s}_block{b}",)
            if f"{t}.conv.weight" in sd:             # ConvBnAct
                w.conv(sd, f"{t}.conv.weight", fpath + ("conv",))
                w.bn(sd, f"{t}.bn1", fpath + ("bn1",))
            elif f"{t}.conv_exp.weight" in sd:       # EdgeResidual
                w.conv(sd, f"{t}.conv_exp.weight", fpath + ("conv_exp",))
                w.bn(sd, f"{t}.bn1", fpath + ("bn1",))
                w.conv(sd, f"{t}.conv_pwl.weight", fpath + ("conv_pwl",))
                w.bn(sd, f"{t}.bn2", fpath + ("bn2",))
            else:                                     # InvertedResidual
                w.conv(sd, f"{t}.conv_pw.weight", fpath + ("conv_pw",))
                w.bn(sd, f"{t}.bn1", fpath + ("bn1",))
                w.conv(sd, f"{t}.conv_dw.weight", fpath + ("conv_dw",))
                w.bn(sd, f"{t}.bn2", fpath + ("bn2",))
                w.conv(sd, f"{t}.se.conv_reduce.weight",
                       fpath + ("se", "conv_reduce"))
                w.conv(sd, f"{t}.se.conv_expand.weight",
                       fpath + ("se", "conv_expand"))
                w.conv(sd, f"{t}.conv_pwl.weight", fpath + ("conv_pwl",))
                w.bn(sd, f"{t}.bn3", fpath + ("bn3",))
            b += 1


def convert_state_dict(sd: Dict[str, np.ndarray]
                       ) -> Tuple[Dict, Dict, Dict]:
    """Converts reference DepthModel weights to our module tree.

    Returns (params, batch_stats, report) — nested dicts matching our
    module tree plus a report of converted/unconverted torch keys.
    Merge over a fresh init with `merge_params`.
    """
    w = _TreeWriter()
    _convert_matching_encoder(sd, w)
    _convert_unet_matching_encoder(sd, w)
    _convert_mlp(sd, w)
    _convert_cv_encoder(sd, w)
    _convert_decoder(sd, w)
    _convert_efficientnet(sd, w)
    report = {
        "converted": sorted(w.used),
        "skipped": sorted(k for k in sd if k not in w.used),
    }
    return w.params, w.batch_stats, report


def merge_params(base: Dict, overlay: Dict) -> Dict:
    """Recursively overlays converted tensors onto an init tree, checking
    shapes."""
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape"):
                assert tuple(out[k].shape) == tuple(np.shape(v)), \
                    f"shape mismatch at {k}: {out[k].shape} vs {np.shape(v)}"
            out[k] = np.asarray(v, dtype=np.float32)
    return out
