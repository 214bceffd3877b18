"""Profiling / tracing hooks.

The reference has no tracer beyond wall-clock meters (SURVEY.md §5); its
MetricLogger tracks iter/data time + CUDA memory (util/misc.py:125-190).
Here the equivalents are:

* :class:`StepTimer` — wall-clock step/data timing with imgs/sec (the
  first-class benchmark metric), used by the CLIs via MetricLogger.
* :func:`trace` — a ``jax.profiler`` trace context producing a TensorBoard-
  loadable (perfetto) trace of XLA execution for a window of steps
  (``--profile_dir`` on the CLIs).
* :func:`device_memory_stats` — per-device HBM usage (the CUDA
  max_memory_allocated analogue, util/misc.py:153-166).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace window; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict[str, float]:
    """Best-effort per-device memory stats in MiB."""
    import jax

    out: dict[str, float] = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d.id)] = round(
                stats.get("bytes_in_use", 0) / (1024 ** 2), 1
            )
    return out


class StepTimer:
    """Steady-state steps/sec + imgs/sec with warmup discard."""

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self):
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def imgs_per_sec(self) -> float:
        if self._t0 is None or self._count <= self.warmup:
            return 0.0
        steady = self._count - self.warmup
        return steady * self.batch_size / (time.perf_counter() - self._t0)
