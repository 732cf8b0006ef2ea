"""Profiling: XLA trace capture + particle-throughput counters.

The reference's only timing is a commented-out ``tick/tock`` pair
(`/root/reference/DPFs.py:325,341-342`).  Here profiling is first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` capturing a
    TensorBoard-viewable XLA trace of everything inside;
  * ``ThroughputMeter`` — wall-clock particle-transitions/sec/chip counter
    (the BASELINE.md north-star metric), with proper ``block_until_ready``
    fencing and warmup discard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Particle-transitions/sec counter over training/filtering steps.

    Usage::

        meter = ThroughputMeter(batch=32, particles=100, seq_len=50, warmup=3)
        for step in ...:
            state, m = train_step(state, batch, key)
            meter.tick(m["loss"])
        print(meter.rate())         # transitions/sec (post-warmup steps)
    """

    def __init__(self, batch: int, particles: int, seq_len: int,
                 warmup: int = 3):
        self.transitions_per_step = batch * particles * seq_len
        self.warmup = warmup
        self._steps = 0
        self._t0: Optional[float] = None

    def tick(self, fence=None) -> None:
        """Count one step; pass any output array as ``fence`` so timing
        waits for device completion at the warmup boundary."""
        self._steps += 1
        if self._steps == self.warmup:
            if fence is not None:
                jax.block_until_ready(fence)
            self._t0 = time.perf_counter()

    def rate(self, fence=None) -> float:
        if fence is not None:
            jax.block_until_ready(fence)
        timed_steps = self._steps - self.warmup
        if self._t0 is None or timed_steps <= 0:
            return float("nan")
        dt = time.perf_counter() - self._t0
        return self.transitions_per_step * timed_steps / dt
