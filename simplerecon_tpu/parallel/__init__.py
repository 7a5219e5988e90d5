"""Device-mesh construction and sharded train/eval steps.

The reference delegates all of its distributed story to PyTorch Lightning
DDP over NCCL (`/root/reference/train.py:124-142`); here data parallelism
is a first-class component: a `jax.sharding.Mesh` with a `data` axis, a
batch-sharded jitted train step, and XLA-inserted `psum` gradient
reductions over ICI.
"""

from simplerecon_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated_sharding, shard_batch)
from simplerecon_tpu.parallel.train import (TrainState, eval_step_fn,
                                            init_train_state,
                                            make_example_batch,
                                            make_lr_schedule, make_optimizer,
                                            make_sharded_train_step,
                                            train_step_fn)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "TrainState", "init_train_state", "make_lr_schedule", "make_optimizer",
    "make_example_batch", "train_step_fn", "eval_step_fn",
    "make_sharded_train_step",
]
