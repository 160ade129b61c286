"""Profiling / tracing.

The reference's observability is a forward-hook FLOPs profiler and
AverageMeter timers (`lib/utils/utils.py:110-242`, SURVEY §5). TPU-native
equivalents:
- `trace(logdir)`: jax.profiler trace context producing TensorBoard/XProf
  dumps of the compiled steps (HBM, MXU utilization, fusion view).
- `StepTimer`: wall-clock step/img-per-sec meter with device sync.
- `model_summary` (utils/summary.py): params + XLA cost-analysis FLOPs.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter: call tick(batch) after each step; blocks on the
    metrics pytree so timings reflect real device completion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.images = 0
        self._t0 = None

    def tick(self, n_images: int, sync=None):
        if sync is not None:
            jax.block_until_ready(sync)
        self.count += 1
        if self.count == self.warmup:
            self._t0 = time.perf_counter()
            self.images = 0
        elif self.count > self.warmup:
            self.images += n_images

    @property
    def img_per_sec(self) -> float:
        if self._t0 is None or self.images == 0:
            return 0.0
        return self.images / (time.perf_counter() - self._t0)
