"""Checkpoint save/resume.

The reference relies on Lightning's ModelCheckpoint
(`/root/reference/train.py:111-117`) with three behaviors we reproduce:

  * full-state resume (params + optimizer + step + batch_stats + options):
    `save_checkpoint` / `restore_checkpoint`;
  * weights-only finetune (`--load_weights_from_checkpoint`,
    `/root/reference/train.py:40-48`): `load_weights`;
  * options serialized alongside the weights and authoritative at
    inference (the reference stores hparams inside the .ckpt,
    `experiment_modules/depth_model.py:104`, `test.py:188-195`):
    `load_options_from_checkpoint`;
  * "strip" (`weights/strip_checkpoint.py`): `strip_checkpoint` writes a
    weights-only copy without optimizer state.

Storage is orbax (`StandardCheckpointer`) under `<dir>/step_<N>/state`,
with `options.yaml` next to it.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from simplerecon_tpu.options import Options, load_options_yaml, \
    save_options_yaml

_STEP_RE = re.compile(r"^step_(\d+)$")


def _step_dir(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := _STEP_RE.match(d))]
    return max(steps) if steps else None


def save_checkpoint(ckpt_dir: str, state, opts: Optional[Options] = None,
                    keep: int = 2):
    """Saves the full TrainState (and options) at `state.step`."""
    step = int(jax.device_get(state.step))
    path = _step_dir(ckpt_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"),
                   jax.device_get(state), force=True)
    if opts is not None:
        save_options_yaml(os.path.join(path, "options.yaml"), opts)
    # rotate old checkpoints
    steps = sorted(s for s in (latest_step(ckpt_dir),) if s is not None)
    all_steps = sorted(int(m.group(1)) for d in os.listdir(ckpt_dir)
                       if (m := _STEP_RE.match(d)))
    for s in all_steps[:-keep]:
        import shutil
        shutil.rmtree(_step_dir(ckpt_dir, s), ignore_errors=True)
    return path


def restore_checkpoint(ckpt_dir: str, target_state,
                       step: Optional[int] = None):
    """Full-state resume. `target_state` supplies the pytree structure
    (an abstract or concrete TrainState)."""
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(_step_dir(ckpt_dir, step), "state")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target_state)


def load_weights(ckpt_path_or_dir: str, target_state,
                 step: Optional[int] = None):
    """Weights-only load: params + batch_stats from a checkpoint into a
    freshly-initialized state; optimizer state and step are kept from
    `target_state` (the reference's `load_weights_from_checkpoint`)."""
    if os.path.basename(os.path.normpath(ckpt_path_or_dir)).startswith(
            "step_"):
        path = os.path.join(ckpt_path_or_dir, "state")
    else:
        restored = restore_checkpoint(ckpt_path_or_dir, target_state, step)
        return target_state.replace(params=restored.params,
                                    batch_stats=restored.batch_stats)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target_state)
    return target_state.replace(params=restored.params,
                                batch_stats=restored.batch_stats)


def load_options_from_checkpoint(ckpt_dir: str,
                                 step: Optional[int] = None) -> Options:
    """Reads the options stored with a checkpoint — these are
    authoritative at inference, as in the reference (`test.py:188-195`)."""
    if step is None:
        step = latest_step(ckpt_dir)
    path = os.path.join(_step_dir(ckpt_dir, step), "options.yaml")
    return Options.from_dict(load_options_yaml(path))


def strip_checkpoint(src_dir: str, dst_dir: str, target_state,
                     step: Optional[int] = None):
    """Writes a weights-only copy (params + batch_stats + options, no
    optimizer state) — `weights/strip_checkpoint.py:1-25`."""
    if step is None:
        step = latest_step(src_dir)
    restored = restore_checkpoint(src_dir, target_state, step)
    stripped = {"params": jax.device_get(restored.params),
                "batch_stats": jax.device_get(restored.batch_stats),
                "step": np.asarray(int(jax.device_get(restored.step)))}
    path = _step_dir(dst_dir, int(stripped["step"]))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "weights"), stripped, force=True)
    opts_yaml = os.path.join(_step_dir(src_dir, step), "options.yaml")
    if os.path.exists(opts_yaml):
        import shutil
        shutil.copy(opts_yaml, os.path.join(path, "options.yaml"))
    return path
