"""Options/config system tests (reference `options.py` parity)."""

import numpy as np

from simplerecon_tpu.options import (Options, OptionsHandler,
                                     load_options_yaml, save_options_yaml)


def test_yaml_roundtrip(tmp_path):
    opts = Options()
    opts.name = "abc"
    opts.lr = 3e-4
    opts.lr_steps = [1000, 2000]
    path = str(tmp_path / "o.yaml")
    save_options_yaml(path, opts)
    loaded = Options.from_dict(load_options_yaml(path))
    assert loaded.name == "abc"
    assert np.isclose(loaded.lr, 3e-4)
    assert loaded.lr_steps == [1000, 2000]


def test_reads_reference_tagged_yaml(tmp_path):
    """Reference configs are `!!python/object:options.Options` tagged;
    we parse the mapping without unpickling."""
    path = tmp_path / "ref.yaml"
    path.write_text("!!python/object:options.Options\n"
                    "name: hero_model\n"
                    "batch_size: 16\n"
                    "gpus: 2\n"
                    "precision: 16\n")
    d = load_options_yaml(str(path))
    opts = Options.from_dict(d)
    assert opts.name == "hero_model"
    assert opts.batch_size == 16
    assert opts.num_devices == 2  # gpus alias
    assert opts.compute_dtype == "bfloat16"


def test_two_file_layering_and_cli(tmp_path):
    model_cfg = tmp_path / "model.yaml"
    model_cfg.write_text("name: base\nbatch_size: 16\nlr: 0.0001\n")
    data_cfg = tmp_path / "data.yaml"
    data_cfg.write_text("dataset: vdr\nbatch_size: 8\n")

    handler = OptionsHandler()
    opts = handler.parse_and_merge_options(cl_args_list=[
        "--config_file", str(model_cfg),
        "--data_config_file", str(data_cfg),
        "--batch_size", "4", "--run_fusion"])
    # precedence: config < data_config < CLI
    assert opts.name == "base"
    assert opts.dataset == "vdr"
    assert opts.batch_size == 4
    assert opts.run_fusion is True
    assert np.isclose(opts.lr, 1e-4)


def test_unknown_keys_tolerated():
    opts = Options()
    opts.update_from({"some_legacy_flag": 7, "name": "x"})
    assert opts.name == "x"
    assert opts._unknown["some_legacy_flag"] == 7


def test_derived_properties():
    opts = Options()
    assert opts.num_source_views == 7
    assert opts.matching_height == 96 and opts.matching_width == 128
    opts.precision = "32"
    assert opts.compute_dtype == "float32"


def test_shipped_configs_parse():
    from simplerecon_tpu.models.depth_model import build_depth_model
    for cfg in ("configs/models/hero_model.yaml",
                "configs/models/dot_product_model.yaml"):
        opts = Options.from_dict(load_options_yaml(cfg))
        model = build_depth_model(opts)
        assert model.feature_volume_type in ("mlp_feature_volume",
                                             "simple_cost_volume")


def test_fast_cost_volume_maps_to_pallas_backend():
    """--fast_cost_volume swaps in the banded Pallas kernel at build
    time (the reference's inference-only fast path,
    /root/reference/test.py:196-198); explicit non-xla backends win."""
    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options

    opts = Options()
    assert build_depth_model(opts).cost_volume_backend == "xla_fused"
    opts.fast_cost_volume = True
    assert build_depth_model(opts).cost_volume_backend == "pallas"
    opts.cost_volume_backend = "pallas_v1"
    assert build_depth_model(opts).cost_volume_backend == "pallas_v1"


def test_custom_vjp_cli_string_normalization():
    """CLI delivers strings for the object-typed custom-vjp flag; build
    must normalize boolish strings and pass 'pallas' through."""
    from simplerecon_tpu.models.depth_model import build_depth_model
    from simplerecon_tpu.options import Options

    opts = Options()
    for raw, want in (("false", False), ("0", False), ("true", True),
                      ("1", True), ("pallas", "pallas"),
                      (False, False), ("none", False)):
        opts.cost_volume_custom_vjp = raw
        assert build_depth_model(opts).cost_volume_custom_vjp == want, raw
