"""Phase timing + throughput counters (replaces the reference's clock() pairs,
MTPC/MTPC.cpp:39-63 and the findGarCor accumulator MTPC/pathTracing.cpp:271-272,
396-430). Also hosts jax.profiler trace helpers."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

from .logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def phase_timer(label: str, work: Optional[float] = None, unit: str = "items"):
    """Wall timer that blocks on device completion; optionally reports
    ``work/second`` throughput."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if "result" in box:
            jax.block_until_ready(box["result"])
        dt = time.perf_counter() - t0
        if work:
            log.info("%s: %.1f ms (%.3e %s/s)", label, dt * 1e3, work / dt, unit)
        else:
            log.info("%s: %.1f ms", label, dt * 1e3)
        box["seconds"] = dt


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context; view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
