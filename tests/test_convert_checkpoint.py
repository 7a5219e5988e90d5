"""Checkpoint-converter plumbing test.

Fabricates a torch-named state_dict with the right shapes for a tiny
model, converts it, and merges it onto a fresh Flax init — validating
the name mapping and every transpose is self-consistent. (Real published
weights slot through the same path.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.models.depth_model import DepthModel
from simplerecon_tpu.utils.convert_reference_checkpoint import (
    convert_state_dict, merge_params)


def tiny_model():
    return DepthModel(image_height=64, image_width=96,
                      matching_num_depth_bins=8, model_num_views=3,
                      dtype=jnp.float32)


def fabricate_state_dict(params, batch_stats):
    """Inverse of the converter's mapping for the pieces it covers."""
    rng = np.random.RandomState(0)
    sd = {}
    # small weights: unit-normal convs compound to inf/NaN through the
    # network; the test validates the name mapping, not training
    scale = 0.05

    def t_conv(p):
        return (scale * rng.randn(*np.transpose(p, (3, 2, 0, 1)).shape)
                ).astype(np.float32)

    def put_conv(tname, fparams, has_bias=None):
        sd[f"{tname}.weight"] = t_conv(fparams["kernel"])
        if has_bias is None:
            has_bias = "bias" in fparams
        if has_bias:
            sd[f"{tname}.bias"] = (scale * rng.randn(
                *fparams["bias"].shape)).astype(np.float32)

    def put_bn(tname, fstats):
        n = fstats["mean"].shape[0]
        sd[f"{tname}.weight"] = rng.rand(n).astype(np.float32) + 0.5
        sd[f"{tname}.bias"] = (scale * rng.randn(n)).astype(np.float32)
        sd[f"{tname}.running_mean"] = (scale * rng.randn(n)
                                       ).astype(np.float32)
        sd[f"{tname}.running_var"] = rng.rand(n).astype(np.float32) + 0.5

    def put_block(tname, fblock):
        put_conv(f"{tname}.conv1", fblock["conv1"])
        put_conv(f"{tname}.conv2", fblock["conv2"])
        if "downsample_conv" in fblock:
            put_conv(f"{tname}.downsample.0", fblock["downsample_conv"])

    m = params["matching_model"]
    ms = batch_stats["matching_model"]
    put_conv("matching_model.net.0", m["conv1"], has_bias=False)
    put_bn("matching_model.net.1", ms["bn1"])
    for b in (0, 1):
        blk = m[f"layer1_{b}"]
        put_conv(f"matching_model.net.4.{b}.conv1", blk["conv1"],
                 has_bias=False)
        put_conv(f"matching_model.net.4.{b}.conv2", blk["conv2"],
                 has_bias=False)
        put_bn(f"matching_model.net.4.{b}.bn1",
               ms[f"layer1_{b}"]["bn1"])
        put_bn(f"matching_model.net.4.{b}.bn2",
               ms[f"layer1_{b}"]["bn2"])
    put_conv("matching_model.net.5", m["head_conv1"])
    put_conv("matching_model.net.8", m["head_conv2"])

    for our, theirs in (("dense0", 0), ("dense1", 2), ("dense2", 4)):
        fp = params["cost_volume"]["mlp"][our]
        sd[f"cost_volume.mlp.net.{theirs}.weight"] = (
            scale * rng.randn(*np.transpose(fp["kernel"], (1, 0)).shape)
        ).astype(np.float32)
        sd[f"cost_volume.mlp.net.{theirs}.bias"] = (
            scale * rng.randn(*fp["bias"].shape)).astype(np.float32)

    cv = params["cost_volume_net"]
    for i in range(4):
        put_block(f"cost_volume_net.convs.ds_conv_{i}", cv[f"ds_conv_{i}"])
        put_block(f"cost_volume_net.convs.conv_{i}.0", cv[f"conv_{i}a"])
        put_block(f"cost_volume_net.convs.conv_{i}.1", cv[f"conv_{i}b"])

    dd = params["depth_decoder"]
    for name, fblock in dd.items():
        if name.startswith(("diag_conv", "right_conv", "up_conv")):
            put_block(f"depth_decoder.convs.{name}", fblock)
        elif name.startswith("in_conv"):
            put_block(f"depth_decoder.convs.{name}.0", fblock["block0"])
            put_block(f"depth_decoder.convs.{name}.1", fblock["block1"])
        elif name.endswith("_block"):
            i = name.split("_")[1]
            put_block(f"depth_decoder.convs.output_{i}.0", fblock)
        elif name.endswith("_conv"):
            i = name.split("_")[1]
            put_conv(f"depth_decoder.convs.output_{i}.1", fblock)
    return sd


def test_converter_roundtrip():
    from simplerecon_tpu.parallel.train import make_example_batch
    from simplerecon_tpu.options import Options
    opts = Options()
    opts.image_height, opts.image_width = 64, 96
    opts.matching_num_depth_bins, opts.model_num_views = 8, 3
    batch = make_example_batch(opts, 1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), batch["cur"],
                           batch["src"], flip=False, train=False)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = fabricate_state_dict(params, stats)
    conv_params, conv_stats, report = convert_state_dict(sd)
    assert not report["skipped"], f"unconsumed keys: {report['skipped']}"

    merged_params = merge_params(params, conv_params)
    merged_stats = merge_params(stats, conv_stats)

    # the merged tree must run; check the raw log-depth head (exp() can
    # legitimately overflow with random fabricated logits)
    outputs = model.apply({"params": merged_params,
                           "batch_stats": merged_stats},
                          batch["cur"], batch["src"], flip=False,
                          train=False)
    assert np.isfinite(np.asarray(
        outputs["log_depth_pred_s0_bhw1"], np.float32)).all()

    # converted weights actually landed (differ from init)
    w_init = params["cost_volume"]["mlp"]["dense0"]["kernel"]
    w_new = merged_params["cost_volume"]["mlp"]["dense0"]["kernel"]
    assert not np.allclose(w_init, w_new)
