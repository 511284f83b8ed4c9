"""Profiling & phase counters — the TPU equivalent of the reference's
wall-clock-only ``speed_metrics`` (SURVEY.md §5: jax.profiler trace +
per-phase counters).

Usage::

    with trace_if_enabled():             # CYCLEDIFFUSION_TRACE_DIR=/tmp/trace
        ...

    counters = PhaseCounters()
    with counters.phase("encode", units=n_chains):
        ...
    counters.summary()   # {'encode_s': ..., 'encode_units_per_s': ...}
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace_if_enabled():
    """Emit a jax.profiler trace when CYCLEDIFFUSION_TRACE_DIR is set."""
    trace_dir = os.environ.get("CYCLEDIFFUSION_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class PhaseCounters:
    """Accumulating wall-time + unit counters per named phase."""

    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.units: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, units: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.units[name] += units

    def summary(self) -> Dict[str, float]:
        out = {}
        for name, secs in self.seconds.items():
            out[f"{name}_s"] = round(secs, 4)
            if self.units[name] and secs > 0:
                out[f"{name}_units_per_s"] = round(self.units[name] / secs, 3)
        return out
