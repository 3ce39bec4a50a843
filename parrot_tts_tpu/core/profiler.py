"""Profiling hooks.

The reference has no tracing at all (SURVEY.md §5) — only wall-clock prints.
Here: `jax.profiler` trace capture around training/serving regions plus the
wall-clock Throughput/RTF counters in core.metrics.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named region for the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
