"""Profiling — the GPU timestamp-query substrate analog (SURVEY.md §2.11).

jax.profiler traces (Perfetto/XPlane) replace the D3D12 timestamp query
heap; DeviceTimer in utils/timers.py covers the running-average
per-dispatch measurement.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str = "out/profile"):
    """Capture a device trace for the enclosed scope, viewable in
    Perfetto / TensorBoard."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    """Named region inside a trace (the NAME_D3D12_OBJECT analog for
    profiler legibility)."""
    return jax.profiler.TraceAnnotation(name)
