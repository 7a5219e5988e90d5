"""Profiling / tracing harness.

The reference only timed the model with CUDA events
(`/root/reference/test.py:211-314`); here profiling is a first-class
utility: `jax.profiler` traces viewable in TensorBoard/Perfetto, plus a
lightweight stage timer for the host pipeline.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Captures a device trace: `with trace("/tmp/jax-trace"): step()`.
    Open with TensorBoard's profile plugin or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage timing for host-side pipelines.

    with timer.stage("decode"): ...
    timer.summary() -> {"decode": {"total_s": ..., "count": ..., ...}}
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": total,
                       "count": self._counts[name],
                       "mean_ms": 1e3 * total / max(self._counts[name], 1)}
                for name, total in self._totals.items()}

    def dump(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.summary(), indent=2, sort_keys=True)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                f.write(text)
        return text
