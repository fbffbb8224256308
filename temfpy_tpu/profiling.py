"""Lightweight tracing/profiling instrumentation.

The reference has no profiling story (SURVEY.md section 5.1: plain module
loggers only).  Here every driver wraps its pipeline stages in
:func:`stage` timers, and :func:`trace` exposes the full ``jax.profiler``
device trace for TensorBoard/XProf.

Usage::

    from temfpy_tpu import profiling
    with profiling.collect() as prof:
        mps = slater.H_to_MPS(H, {"chi_max": 256})
    print(prof.report())

    with profiling.trace("/tmp/tb"):      # full XLA device trace
        mps = slater.H_to_MPS(H, {"chi_max": 256})
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger(__name__)

_active: list["Profile"] = []


class Profile:
    """Accumulates wall-clock per pipeline stage."""

    def __init__(self):
        self.seconds: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)

    def add(self, name: str, dt: float):
        self.seconds[name] += dt
        self.calls[name] += 1

    def report(self) -> str:
        total = sum(self.seconds.values())
        lines = [f"{'stage':<24} {'calls':>6} {'seconds':>10} {'share':>7}"]
        for name, sec in sorted(self.seconds.items(), key=lambda kv: -kv[1]):
            share = sec / total if total else 0.0
            lines.append(f"{name:<24} {self.calls[name]:>6} {sec:>10.3f} {share:>6.1%}")
        lines.append(f"{'TOTAL':<24} {'':>6} {total:>10.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def collect():
    """Collects per-stage timings of everything run inside the context."""
    prof = Profile()
    _active.append(prof)
    try:
        yield prof
    finally:
        _active.remove(prof)


@contextlib.contextmanager
def stage(name: str):
    """Times one pipeline stage into every active collector (no-op cost when
    none are active)."""
    if not _active:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        for prof in _active:
            prof.add(name, dt)


@contextlib.contextmanager
def trace(logdir: str):
    """Full jax.profiler device trace (TensorBoard format)."""
    import jax

    with jax.profiler.trace(logdir):
        yield
