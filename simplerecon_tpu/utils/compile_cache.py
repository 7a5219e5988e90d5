"""Persistent XLA compile cache, shared by the CLIs.

Full-model compiles take minutes (TPU) to tens of minutes (1-core CPU
hosts); repeat CLI invocations with unchanged code should hit the disk
cache instead. bench.py and the profiling scripts configure the same
directory.

Caveat (verify-skill watchout): never run two JAX processes that
COMPILE the same programs concurrently against one cache directory —
concurrent writes can corrupt entries. Distinct programs coexist fine.
"""

from __future__ import annotations

import os


def enable(path: str | None = None) -> None:
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        path or os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
