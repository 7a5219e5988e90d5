"""Pure-JAX compute ops: geometry, sampling, filtering, cost volumes."""

from simplerecon_tpu.ops import geometry, image, sampling  # noqa: F401
