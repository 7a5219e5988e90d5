"""Training driver.

The counterpart of `/root/reference/train.py:34-145` without Lightning:
data-parallel mesh + jitted SPMD train step, periodic validation
(`val_interval`/`val_batches`), best/last checkpointing on val loss,
TensorBoard-style scalar logging to JSONL, options snapshot, and
weights-only finetune / full resume.

    python -m simplerecon_tpu.scripts.train --config_file \
        configs/models/hero_model.yaml --data_config_file configs/...yaml
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simplerecon_tpu.data.loader import DataLoader, to_train_schema
from simplerecon_tpu.data.registry import get_dataset
from simplerecon_tpu.models.depth_model import build_depth_model
from simplerecon_tpu.options import Options, OptionsHandler, \
    save_options_yaml
from simplerecon_tpu.parallel import (make_mesh, make_optimizer,
                                      make_sharded_train_step)
from simplerecon_tpu.parallel.train import (eval_step_fn, init_train_state,
                                            make_example_batch,
                                            make_lr_schedule)
from simplerecon_tpu.utils import checkpoint as ckpt_lib


class JSONLLogger:
    """Scalar logger: one JSON object per line (always), plus TensorBoard
    event files when TensorFlow is importable (the reference logs to
    TensorBoard via Lightning, `train.py:97`)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:
            import tensorflow as tf
            self._tb = tf.summary.create_file_writer(
                os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step),
               **{f"{prefix}{k}": float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}{k}", float(v),
                                      step=int(step))
                self._tb.flush()

    def log_images(self, step: int, panels_nhw3: "np.ndarray",
                   panel_dir: str, tag: str = "val/panels"):
        """Writes the validation image panels as PNGs (always) and as
        TensorBoard images when available — the reference logs
        RGB/GT/pred-depth/normals/CV-argmax panels every validation
        (`experiment_modules/depth_model.py:540-603`)."""
        from simplerecon_tpu.utils.visualization import save_image
        os.makedirs(panel_dir, exist_ok=True)
        for i, panel in enumerate(panels_nhw3):
            save_image(os.path.join(panel_dir,
                                    f"step{int(step):08d}_{i}.png"), panel)
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.image(tag, panels_nhw3.astype("float32"),
                                 step=int(step),
                                 max_outputs=len(panels_nhw3))
                self._tb.flush()


def build_dataloaders(opts: Options):
    dataset_class, _ = get_dataset(opts.dataset,
                                   opts.dataset_scan_split_file or None,
                                   opts.single_debug_scan_id,
                                   verbose=False)

    def make(split, shuffle, batch_size):
        ds = dataset_class(
            dataset_path=opts.dataset_path, split=split,
            mv_tuple_file_suffix=opts.mv_tuple_file_suffix,
            tuple_info_file_location=opts.tuple_info_file_location or None,
            num_images_in_tuple=opts.num_images_in_tuple
            or opts.model_num_views,
            image_height=opts.image_height, image_width=opts.image_width,
            shuffle_tuple=opts.shuffle_tuple)
        return DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                          num_workers=opts.num_workers, drop_last=True,
                          adapter=to_train_schema, seed=opts.random_seed)

    return (make("train", True, opts.batch_size),
            make("val", False, opts.val_batch_size))


def main(opts: Options):
    from simplerecon_tpu.utils import compile_cache
    compile_cache.enable()

    np.random.seed(opts.random_seed)
    log_dir = os.path.join(opts.log_dir, opts.name)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    os.makedirs(log_dir, exist_ok=True)
    save_options_yaml(os.path.join(log_dir, "options.yaml"), opts)
    # snapshot the source for reproducibility (`train.py:101-108` in the
    # reference)
    from simplerecon_tpu.utils.cache import copy_code_state
    try:
        copy_code_state(log_dir)
    except Exception as e:
        print(f"code snapshot failed: {e}")
    logger = JSONLLogger(log_dir)

    model = build_depth_model(opts)
    optimizer = make_optimizer(opts)
    mesh = make_mesh(min(opts.num_devices, len(jax.devices())))
    n_dev = mesh.devices.size
    assert opts.batch_size % n_dev == 0, \
        f"batch_size {opts.batch_size} must divide over {n_dev} devices"

    rng = jax.random.PRNGKey(opts.random_seed)
    state = init_train_state(model, optimizer, rng,
                             make_example_batch(opts, opts.batch_size))

    if opts.resume:  # full state resume (`train.py:141`)
        state = ckpt_lib.restore_checkpoint(opts.resume, state)
        print(f"resumed from {opts.resume} at step {int(state.step)}")
    elif opts.load_weights_from_checkpoint:  # finetune (`train.py:40-48`)
        state = ckpt_lib.load_weights(opts.load_weights_from_checkpoint,
                                      state)
        print(f"loaded weights from {opts.load_weights_from_checkpoint}")

    train_step = make_sharded_train_step(model, optimizer, mesh)
    eval_step = jax.jit(eval_step_fn(model))
    lr_schedule = make_lr_schedule(opts)

    train_loader, val_loader = build_dataloaders(opts)

    best_val_loss = float("inf")
    step = int(state.step)
    t_last = time.perf_counter()
    from simplerecon_tpu.data.loader import device_prefetch
    from simplerecon_tpu.parallel.mesh import batch_sharding
    data_sharding = batch_sharding(mesh)
    while step < opts.max_steps:
        # double-buffered H2D laid out on the mesh: batch n+1 transfers
        # while the step runs batch n (reference train.py:65-94
        # pinned-memory non_blocking equivalent)
        for device_batch in device_prefetch(train_loader,
                                            sharding=data_sharding):
            if step >= opts.max_steps:
                break
            # fresh per-step rng (the in-step flip additionally folds in
            # state.step; this decorrelates any future rng consumers too)
            state, metrics = train_step(state, device_batch,
                                        jax.random.fold_in(rng, step))
            step += 1  # host-side mirror of state.step (no device sync)

            if step % opts.log_interval == 0:
                metrics = jax.device_get(metrics)
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                metrics["steps_per_sec"] = opts.log_interval / max(dt, 1e-9)
                # LR is schedule-determined; log it like the reference's
                # LearningRateMonitor (`train.py:121`)
                metrics["lr"] = float(lr_schedule(step))
                logger.log(step, metrics, prefix="train/")
                print(f"step {step}: loss="
                      f"{float(metrics['loss']):.4f} "
                      f"({metrics['steps_per_sec']:.2f} it/s)")

            if step % opts.val_interval == 0:
                val_losses = []
                for vi, vbatch in enumerate(val_loader):
                    if vi >= opts.val_batches:
                        break
                    vbatch = jax.tree_util.tree_map(jnp.asarray, vbatch)
                    loss_dict, val_outputs = eval_step(state, vbatch)
                    val_losses.append(float(loss_dict["loss"]))
                    if vi == 0:
                        from simplerecon_tpu.utils.visualization import \
                            build_image_panels
                        host_out = {k: np.asarray(v) for k, v in
                                    val_outputs.items() if v is not None}
                        panels = build_image_panels(
                            jax.device_get(vbatch["cur"]), host_out)
                        logger.log_images(
                            step, panels,
                            os.path.join(log_dir, "panels"))
                if val_losses:
                    val_loss = float(np.mean(val_losses))
                    logger.log(step, {"loss": val_loss}, prefix="val/")
                    print(f"step {step}: val loss {val_loss:.4f}")
                    ckpt_lib.save_checkpoint(ckpt_dir, state, opts)
                    if val_loss < best_val_loss:
                        best_val_loss = val_loss
                        ckpt_lib.save_checkpoint(
                            os.path.join(log_dir, "best"), state, opts,
                            keep=1)

    ckpt_lib.save_checkpoint(ckpt_dir, state, opts)
    print(f"training done at step {step}")
    return state


if __name__ == "__main__":
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    handler.pretty_print_options()
    main(opts)
