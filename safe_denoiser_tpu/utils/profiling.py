"""Profiling & tracing utilities.

The reference has no profiling beyond wall-clock prints (SURVEY.md §5);
the TPU rebuild adds first-class hooks:
  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the sampling scan.
  * ``StepTimer`` — wall-clock timing with device sync, replacing the
    reference's raw time.time() pairs (run_nudity.py:414-464).
  * ``annotate`` — TraceAnnotation for named regions inside host code.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Accumulates per-step wall-clock with device synchronization."""

    sync: bool = True
    times: list[float] = field(default_factory=list)
    _t0: float = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if self.sync and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> dict:
        if not self.times:
            return {"n": 0}
        ts = sorted(self.times)
        return {"n": len(ts), "mean_s": self.mean, "min_s": ts[0],
                "max_s": ts[-1], "p50_s": ts[len(ts) // 2]}
