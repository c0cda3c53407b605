"""Profiling / tracing utilities.

The reference has no profiling beyond wall-clock epoch ETA
(SURVEY.md §5.1). Here: `jax.profiler` trace capture around training
windows, named trace annotations for the hot phases, and a lightweight
step timer with percentile summaries.

Usage:
    with trace_window("/tmp/nfdpm_trace", enabled=True):
        ... training steps ...

    timer = StepTimer()
    for batch in loader:
        with timer.step():
            state, m = train_step(state, batch, key)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np


@contextlib.contextmanager
def trace_window(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a code region (TensorBoard-viewable)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces (StepTraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class EpochProfiler:
    """Capture ONE epoch's first `max_steps` steps as a profiler trace,
    written under `<log_dir>/plugins/profile/<ts>` (jax.profiler's layout),
    so `tensorboard --logdir <run_dir>/tb` shows the Profile tab next to the
    run's scalar curves (tensorboard-plugin-profile). Wired to
    `model.training.profile_epoch` / `profile_steps` in both trainers.

    Epoch 1 includes XLA compilation in the trace (that is sometimes the
    point); profile a later epoch for steady-state steps. One-shot: traces
    at most one epoch per run."""

    def __init__(self, log_dir: str, profile_epoch=None, max_steps: int = 50):
        self.log_dir = log_dir
        self.profile_epoch = profile_epoch
        self.max_steps = max_steps
        self._active = False
        self._done = False
        self._n = 0

    def start_epoch(self, epoch: int) -> None:
        if self._done or self.profile_epoch is None or epoch != self.profile_epoch:
            return
        import jax

        jax.profiler.start_trace(self.log_dir)
        self._active, self._n = True, 0

    def step(self) -> None:
        if not self._active:
            return
        self._n += 1
        if self._n >= self.max_steps:
            self._stop()

    def end_epoch(self) -> None:
        if self._active:
            self._stop()

    def _stop(self) -> None:
        import jax

        jax.profiler.stop_trace()
        self._active, self._done = False, True


class StepTimer:
    """Wall-clock per-step timing with percentile summary."""

    def __init__(self) -> None:
        self.durations: List[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.durations.append(time.perf_counter() - t0)

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        d = np.asarray(self.durations[skip_warmup:] or self.durations)
        if len(d) == 0:
            return {}
        return {
            "steps": int(len(d)),
            "mean_ms": float(d.mean() * 1e3),
            "p50_ms": float(np.percentile(d, 50) * 1e3),
            "p95_ms": float(np.percentile(d, 95) * 1e3),
            "max_ms": float(d.max() * 1e3),
        }
