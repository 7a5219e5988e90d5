"""CLI: strip a training checkpoint to weights-only for distribution.

Counterpart of `/root/reference/weights/strip_checkpoint.py:1-25`.

    python -m simplerecon_tpu.scripts.strip_checkpoint \
        --config_file configs/models/hero_model.yaml \
        --src /path/to/checkpoints --dst /path/to/stripped
"""

from __future__ import annotations

import argparse

import jax

from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options, load_options_yaml
from simplerecon_tpu.parallel.train import (init_train_state,
                                            make_example_batch,
                                            make_optimizer)
from simplerecon_tpu.utils import checkpoint as ckpt_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", required=True)
    ap.add_argument("--src", required=True,
                    help="checkpoint directory (step_N subdirs)")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    opts = Options.from_dict(load_options_yaml(args.config_file))
    model = build_depth_model(opts)
    state = init_train_state(model, make_optimizer(opts),
                             jax.random.PRNGKey(0),
                             make_example_batch(opts, 1))
    out = ckpt_lib.strip_checkpoint(args.src, args.dst, state,
                                    step=args.step)
    print(f"stripped checkpoint -> {out}")


if __name__ == "__main__":
    main()
