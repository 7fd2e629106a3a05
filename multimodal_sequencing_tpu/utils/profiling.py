"""Profiling and timing harness.

The reference has no tracing at all (SURVEY §5.1 — and permanently enables
torch anomaly detection, a slowdown landmine). Here: `jax.profiler` trace
capture around arbitrary code, plus a `StepTimer` that reports honest
steady-state step times (forcing a device-to-host sync, which the remote
TPU runtime requires for true timings)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer for jitted steps with warmup and D2H-forced sync."""

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self.times = []

    def measure(self, fn: Callable, *args, iters: int = 20,
                sync_value: Optional[Callable] = None):
        """fn(*args) -> output; `sync_value(output)` should return a small
        array to fetch (defaults to the output itself)."""
        out = None
        for _ in range(self.warmup):
            out = fn(*args)
            v = sync_value(out) if sync_value else out
            np.asarray(jax.device_get(v))
        self.times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            v = sync_value(out) if sync_value else out
            np.asarray(jax.device_get(v))
            self.times.append(time.perf_counter() - t0)
        return out

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.times) * 1000)

    @property
    def p50_ms(self) -> float:
        return float(np.median(self.times) * 1000)


class StepTraceWindow:
    """--profile_dir support for training loops: capture a jax.profiler
    trace over steps [start, start+n) relative to the loop's first step,
    closing the trace safely when the loop ends inside the window."""

    def __init__(self, log_dir: Optional[str], start: int = 2, n: int = 3):
        self.log_dir = log_dir
        self.start, self.end = start, start + n - 1
        self.active = False

    def before_step(self, rel_step: int):
        if self.log_dir and rel_step == self.start and not self.active:
            jax.profiler.start_trace(self.log_dir)
            self.active = True

    def after_step(self, rel_step: int, sync=None) -> bool:
        """Returns True when the trace was just closed."""
        if self.active and rel_step >= self.end:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self.active = False
            return True
        return False

    def close(self, sync=None):
        if self.active:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self.active = False
