"""Profiling utilities — per-step timing and XLA trace capture.

The reference has no tracing/profiling at all (SURVEY.md §5: only tqdm bars
and cudnn.benchmark toggles); this module adds the TPU-native equivalents:

- :class:`StepTimer` — wall-clock per-step statistics (mean/median/p95,
  steps/sec, clips/sec) with warmup exclusion (first steps are compiles).
- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory, no-op if profiling is unsupported.
- :func:`block` — a *real* completion barrier: fetches one element to host,
  which serializes behind all queued device work (``block_until_ready`` is
  not reliable through the axon relay).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


def block(x) -> None:
    """Barrier that works on every backend: tiny host fetch."""
    import jax

    leaf = jax.tree.leaves(x)
    if leaf:
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


class StepTimer:
    def __init__(self, warmup: int = 1, items_per_step: int = 1):
        self.warmup = warmup
        self.items_per_step = items_per_step
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "median_s": float(np.median(t)),
            "p95_s": float(np.quantile(t, 0.95)),
            "steps_per_sec": float(1.0 / t.mean()),
            "items_per_sec": float(self.items_per_step / t.mean()),
        }


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture an XLA profiler trace (view with TensorBoard). No-op when
    logdir is None or the backend doesn't support profiling."""
    if logdir is None:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(str(logdir))
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
