"""Fault guards: NaN detection and preemption-signal checkpoint flush.

The reference has neither (SURVEY.md §5.2/§5.3: no sanitizers, crashed
variants silently dropped, run_experiment.py:73-78).  On TPU pods a
whole multi-host job dies as a unit on preemption, so the recovery
story is checkpoint-based resume — these helpers close the two gaps:

  * `enable_debug_nans()` turns on jax's op-level NaN re-execution
    checks (variant key `debug_nans: true`).
  * `check_finite_metrics()` is the cheap per-epoch host-side guard:
    every epoch's metrics pytree is scanned once; a non-finite entry
    logs loudly and (with `abort_on_nan`) raises before the run burns
    more device-hours on a diverged state.
  * `PreemptionGuard` converts SIGTERM/SIGUSR1 (the cluster's
    preemption notice) into an end-of-epoch checkpoint flush + clean
    exit, so `load_params`-style resume continues the run.
"""

from __future__ import annotations

import signal
from typing import Any, Callable, Dict

import numpy as np


class NonFiniteMetricError(RuntimeError):
    pass


def enable_debug_nans() -> None:
    import jax
    jax.config.update("jax_debug_nans", True)


def check_finite_metrics(metrics: Dict[str, float], epoch: int,
                         log_fn: Callable[[str], None] | None = None,
                         abort: bool = False) -> bool:
    """Returns True if all metric values are finite; logs offenders."""
    bad = {k: v for k, v in metrics.items()
           if not np.all(np.isfinite(v))}
    if not bad:
        return True
    msg = (f"NON-FINITE metrics at epoch {epoch}: "
           + ", ".join(f"{k}={v}" for k, v in bad.items()))
    (log_fn or print)(msg)
    if abort:
        raise NonFiniteMetricError(msg)
    return False


class PreemptionGuard:
    """SIGTERM/SIGUSR1 -> flush a checkpoint at the next epoch boundary.

    Usage:
        guard = PreemptionGuard()
        for epoch in ...:
            ... train ...
            if guard.should_stop:
                snap.flush(epoch, runner); break
    The handler only sets a flag — the actual Orbax write happens on the
    main thread between epochs, where the runner state is consistent.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGUSR1)):
        self.should_stop = False
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except (ValueError, OSError):
                pass  # non-main thread / unsupported platform

    def _handle(self, signum, frame):
        self.should_stop = True

    def restore(self) -> None:
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
