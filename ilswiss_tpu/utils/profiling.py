"""Phase timing + device tracing.

Rebuild of the reference's gtimer usage (rlkit/core/base_algorithm.py:
gt.reset/set_def_unique :156-157, gt.stamp('sample'/'train'/'eval')
:284-290, read back into Train/Sample/Eval/Total time logging
:329-343).  Phases are context managers that both accumulate wall time
(host view) and emit `jax.profiler.TraceAnnotation` ranges so the same
names show up on the device timeline in xprof.

XPlane traces for xprof are captured with `start_trace`/`stop_trace`
(or automatically by runners when the variant sets `profile_dir`).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax


class PhaseTimer:
    """gtimer-style named-phase accumulator."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._times: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._start = time.time()

    @contextmanager
    def phase(self, name: str):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self._times[name] += time.perf_counter() - t0
                self._counts[name] += 1

    def stamp(self) -> Dict[str, float]:
        """Per-phase seconds since the last reset (+ 'total'), then
        reset — one call per epoch mirrors the reference's epoch-time
        table (base_algorithm.py:329-343)."""
        out = {f"Time/{k}": v for k, v in self._times.items()}
        out["Time/total"] = time.time() - self._start
        self.reset()
        return out


# module-global default, like the reference's module-global gtimer
TIMER = PhaseTimer()
phase = TIMER.phase
stamp = TIMER.stamp


def start_trace(log_dir: str) -> None:
    """Begin an XPlane trace (view with xprof/tensorboard profile)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


@contextmanager
def trace(log_dir: str | None):
    """Trace the enclosed block when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    start_trace(log_dir)
    try:
        yield
    finally:
        stop_trace()
