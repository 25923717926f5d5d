"""Profiling and cost-analysis helpers.

Role parity with SURVEY.md §5 "Tracing / profiling": the reference has only
TorchScript breadcrumbs; the TPU-native equivalents are ``jax.profiler``
traces (viewable in XProf/TensorBoard) and XLA cost analysis of compiled
functions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax

__all__ = ["trace", "annotate", "compiled_cost", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """FLOPs / bytes-accessed estimate of ``fn`` lowered for the current backend.

    Returns {"flops", "bytes_accessed", "peak_memory_bytes"} where available.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0] if analysis else {}
    analysis = dict(analysis or {})
    return {
        "flops": analysis.get("flops"),
        "bytes_accessed": analysis.get("bytes accessed", analysis.get("bytes_accessed")),
        "raw": analysis,
    }


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> Dict[str, float]:
    """Wall-clock a jitted function (blocks on the result each iteration)."""

    def run():
        out = fn(*args)
        jax.block_until_ready(out)
        return out

    for _ in range(warmup):
        run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    return {"mean_seconds": dt, "iters_per_second": 1.0 / dt if dt > 0 else float("inf")}
