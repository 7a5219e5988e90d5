"""Experiment configuration: a plain dataclass + YAML/CLI layering.

Mirrors the flag surface of the reference (`options.py:9-217` in
nianticlabs/simplerecon) so that configs translate 1:1, with two deliberate
departures:

  * YAML files are plain mappings, not `!!python/object:options.Options`
    pickles. Reference-style tagged files are still *readable*: the tag is
    stripped and the mapping is used.
  * TPU-specific flags replace CUDA ones (`gpus` -> `num_devices`, kept as an
    alias; `precision` accepts "bf16"/"fp32" as well as 16/32).

Merge precedence (last wins), identical to the reference
(`options.py:249-254`): config_file < data_config_file < CLI.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import re
from dataclasses import dataclass, field
from typing import List, Optional

import yaml


@dataclass
class Options:
    """All experiment flags. Field names match the reference where a
    corresponding flag exists (see /root/reference/options.py:9-217)."""

    random_seed: int = 0

    # ------------------------------- logs ---------------------------------
    name: str = "debug"
    log_dir: str = os.path.join(os.path.expanduser("~"), "tmp/tensorboard")
    notes: str = ""
    log_interval: int = 100
    val_interval: int = 1000
    val_batches: int = 100

    # ------------------------------- data ---------------------------------
    dataset: str = "scannet"
    dataset_path: str = "/mnt/scannet-data-png"
    num_workers: int = 12
    tuple_info_file_location: str = ""
    mv_tuple_file_suffix: str = "_eight_view_deepvmvs.txt"
    frame_tuple_type: str = "default"
    model_num_views: int = 8
    num_images_in_tuple: Optional[int] = None
    dataset_scan_split_file: str = ""
    split: str = "train"
    image_width: int = 512
    image_height: int = 384
    shuffle_tuple: bool = False
    test_keyframe_buffer_size: int = 30

    # --------------------------- hyperparameters --------------------------
    lr: float = 1e-4
    wd: float = 1e-4
    # optional global-norm gradient clipping (0 = off, reference behavior)
    grad_clip: float = 0.0
    num_sanity_val_steps: int = 0
    max_steps: int = 110000
    batch_size: int = 16
    val_batch_size: int = 16
    # number of TPU devices to shard the batch over ("gpus" in the reference).
    num_devices: int = 1
    # "16"/"bf16" => bfloat16 compute with fp32 params; "32"/"fp32" => fp32.
    precision: str = "16"
    lr_steps: List[int] = field(default_factory=lambda: [70000, 80000])

    # ------------------------------ models --------------------------------
    resume: Optional[str] = None
    load_weights_from_checkpoint: Optional[str] = None
    image_encoder_name: str = "efficientnet"
    depth_decoder_name: str = "unet_pp"
    loss_type: str = "log_l1"
    matching_encoder_type: str = "resnet"
    matching_feature_dims: int = 16
    # "batch" (reference parity) | "group" (GroupNorm-8 stem: train==eval,
    # removes BN running-stat staleness; not checkpoint-compatible)
    matching_norm: str = "batch"
    # stem anti-aliased pool: "reference" (unfused XLA chain) | "pallas"
    # (fused VMEM kernel with hand-written VJP, ops/pallas_pool.py) |
    # "fused" (separable slice form). Kernel and XLA paths are
    # value-identical incl. tie-gradient routing (first-max wins).
    matching_pool_impl: str = "reference"
    matching_scale: int = 1
    matching_num_depth_bins: int = 64
    min_matching_depth: float = 0.25
    max_matching_depth: float = 5.0
    cv_encoder_type: str = "multi_scale_encoder"
    feature_volume_type: str = "mlp_feature_volume"

    # ----------------------------- inference ------------------------------
    output_base_path: str = "outputs"
    run_fusion: bool = False
    fuse_color: bool = False
    fusion_max_depth: float = 3.0
    fusion_resolution: float = 0.04
    depth_fuser: str = "ours"
    single_debug_scan_id: Optional[str] = None
    skip_frames: Optional[int] = None
    skip_to_frame: Optional[int] = None
    pc_fusion_z_thresh: float = 0.04
    n_consistent_thresh: int = 3
    voxel_downsample: float = 0.02
    mask_pred_depth: bool = False
    cache_depths: bool = False
    fusion_use_raw_lowest_cost: bool = False
    high_res_validation: bool = False
    # shard eval batches over all local devices (data axis, replicated
    # params) — multi-chip serving; partial batches are padded
    data_parallel_eval: bool = False
    # the reference's --fast_cost_volume (/root/reference/test.py:196-198)
    # swaps in a faster inference-only cost volume: here the banded
    # Pallas kernel (backend "pallas", 11.4 ms b1 / 10.7 ms-per-frame
    # b8 vs 21.5 ms xla_fused on v5e). Inference only — the kernel has
    # no backward; training keeps xla_fused.
    fast_cost_volume: bool = False
    # "xla_fused" (metadata+MLP fused into the banded warp scan;
    # fastest differentiable path — training default) | "xla" (banded
    # warp, chunked metadata assembly) | "pallas" (banded fused
    # warp+metadata+MLP kernel; fastest inference, no backward) |
    # "pallas_full" (round-2 full-width kernel) | "pallas_v1" (XLA warp
    # sweep + fused metadata/MLP kernel)
    cost_volume_backend: str = "xla_fused"
    # which image axis the banded-matmul sweep bands: "x" (column
    # stripes, full-height contraction — fastest measured for the XLA
    # scan: 11.3 ms warp vs 14.8-25.8 ms for "y" on hero shapes, where
    # epipolar tilt widens row-stripe y-spans and triples the scan step
    # count) | "y" (row stripes, full-width contraction)
    cost_volume_band_axis: str = "x"
    # VJP strategy for the fused sweep (xla_fused backend). Gradients
    # flow to features + MLP weights only; geometry/poses are data,
    # never trained — reference semantics.
    #   "pallas_bwd" (default) — BOTH passes are banded Pallas kernels
    #     (fwd + hand-written transpose-contraction bwd): op-level
    #     fwd+bwd 10.6 ms vs 60 ms for "pallas" at the same config,
    #     and bf16 gradients 20x closer to the fp32 reference than
    #     autodiff's (fp32 in-kernel accumulation of the
    #     cancellation-heavy weight-grad sums: 1.1% vs 21% worst-leaf
    #     error on hero shapes).
    #   "pallas" — banded-Pallas-kernel primal, hand-written XLA
    #     backward.
    #   True — hand-written XLA backward, XLA-scan forward.
    #   False — checkpointed autodiff (pure XLA).
    # Multi-device meshes run the pallas variants under shard_map
    # (make_sharded_train_step) — pallas_call has no GSPMD rule.
    cost_volume_custom_vjp: object = "pallas_bwd"
    # rematerialize encoder/decoder submodules in the backward pass;
    # off = ~83 ms/step faster at b16, fits in 16 GB (re-enable for
    # larger per-chip batches)
    remat_submodules: bool = False

    # --------------------------- visualization ----------------------------
    standard_fps: int = 30
    dump_depth_visualization: bool = False
    use_precomputed_partial_meshes: bool = False
    viz_render_width: int = 640
    viz_render_height: int = 480
    cam_marker_size: float = 0.7
    back_face_alpha: float = 0.5

    # ------------------------------ helpers -------------------------------
    @property
    def compute_dtype(self) -> str:
        return "bfloat16" if str(self.precision) in ("16", "bf16") else "float32"

    @property
    def num_source_views(self) -> int:
        return self.model_num_views - 1

    @property
    def matching_height(self) -> int:
        return self.image_height // (2 ** (self.matching_scale + 1))

    @property
    def matching_width(self) -> int:
        return self.image_width // (2 ** (self.matching_scale + 1))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Options":
        opts = cls()
        for k, v in d.items():
            opts.set(k, v)
        return opts

    def set(self, key: str, value):
        """Sets a flag, translating legacy/reference flag names."""
        if key == "gpus":  # reference name for the data-parallel width
            key, value = "num_devices", int(value)
        if key == "precision":
            value = str(value)
        if not hasattr(self, key):
            # tolerate unknown keys from reference configs rather than crash,
            # but keep them discoverable.
            self._unknown = getattr(self, "_unknown", {})
            self._unknown[key] = value
            return
        setattr(self, key, value)

    def update_from(self, d: dict):
        for k, v in d.items():
            self.set(k, v)


_PY_OBJECT_TAG = re.compile(r"!!python/object:\S+")


def load_options_yaml(path: str) -> dict:
    """Loads a YAML options file into a plain dict.

    Accepts both plain-mapping YAML and the reference's
    `!!python/object:options.Options`-tagged files (the tag is stripped and
    the mapping parsed safely — no object unpickling, unlike
    /root/reference/options.py:391-394).
    """
    with open(path, "r") as f:
        text = f.read()
    text = _PY_OBJECT_TAG.sub("", text)
    data = yaml.safe_load(text)
    if data is None:
        return {}
    if not isinstance(data, dict):
        raise ValueError(f"options file {path} did not parse to a mapping")
    return data


def save_options_yaml(path: str, opts: Options):
    with open(path, "w") as f:
        yaml.safe_dump(opts.to_dict(), f, default_flow_style=False)


class OptionsHandler:
    """Parses config files + CLI args into an `Options` object.

    Mirrors the reference's two-file layering
    (/root/reference/options.py:220-333): --config_file is applied first,
    then --data_config_file, then explicit CLI flags.
    """

    def __init__(self, required_flags: Optional[List[str]] = None):
        self.options = Options()
        self.required_flags = required_flags or []
        self.parser = argparse.ArgumentParser(description="simplerecon_tpu options")
        self.parser.add_argument("--config_file", type=str, default=None)
        self.parser.add_argument("--data_config_file", type=str, default=None)
        self._populate_argparse()

    def _populate_argparse(self):
        for f in dataclasses.fields(Options):
            if f.type in (bool, "bool"):
                self.parser.add_argument(f"--{f.name}", action="store_true",
                                         default=None)
            elif f.name == "lr_steps":
                self.parser.add_argument(f"--{f.name}", type=int, nargs="+",
                                         default=None)
            else:
                base = {int: int, float: float, str: str,
                        "int": int, "float": float, "str": str,
                        "Optional[int]": int, "Optional[str]": str,
                        Optional[int]: int, Optional[str]: str}.get(f.type, str)
                self.parser.add_argument(f"--{f.name}", type=base, default=None)
        # reference-compat alias
        self.parser.add_argument("--gpus", type=int, default=None)

    def parse_and_merge_options(self, config_filepaths=None,
                                ignore_cl_args: bool = False,
                                cl_args_list=None) -> Options:
        cl_args = None
        if not ignore_cl_args:
            cl_args = self.parser.parse_args(cl_args_list)

        paths = []
        if config_filepaths is not None:
            paths = (config_filepaths if isinstance(config_filepaths, list)
                     else [config_filepaths])
        elif cl_args is not None:
            if cl_args.config_file:
                paths.append(cl_args.config_file)
            if cl_args.data_config_file:
                paths.append(cl_args.data_config_file)

        for p in paths:
            self.options.update_from(load_options_yaml(p))
        self.config_filepaths = paths

        if cl_args is not None:
            for key, value in vars(cl_args).items():
                if key in ("config_file", "data_config_file") or value is None:
                    continue
                if isinstance(value, bool) and not value:
                    continue  # store_true flags only override when set
                self.options.set(key, value)

        for flag in self.required_flags:
            if getattr(self.options, flag, None) is None:
                raise ValueError(f"missing required config argument '{flag}'")
        return self.options

    def pretty_print_options(self):
        print("#" * 27 + " Options " + "#" * 27)
        for f in dataclasses.fields(Options):
            print(f"    {f.name}: {getattr(self.options, f.name)}")
        print("#" * 63)
