"""Tracing / profiling helpers (SURVEY §5 'Tracing / profiling').

The reference only prints per-epoch wall-clock (my_trainer.py:483-490).
Here: jax.profiler trace capture (view in TensorBoard/xprof or Perfetto),
a per-step timer with percentile summary, and compiled-program cost
introspection (FLOPs / bytes / memory) for utilization math.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "./runs/profile"):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with p50/p90 summary.

    Forces a scalar fetch per step when `sync` — only use for measurement,
    not production loops (it serializes dispatch)."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        a = np.asarray(self.times)
        if a.size == 0:
            return {}
        return {
            "n": int(a.size),
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "min_s": float(a.min()),
        }


def compiled_cost(fn, *args) -> Dict[str, Any]:
    """Lower+compile a jitted fn and report FLOPs, bytes and memory use."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    mem = compiled.memory_analysis()
    out = {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }
    if mem is not None:
        out.update(
            temp_bytes=int(getattr(mem, "temp_size_in_bytes", 0)),
            argument_bytes=int(getattr(mem, "argument_size_in_bytes", 0)),
            code_bytes=int(getattr(mem, "generated_code_size_in_bytes", 0)),
        )
    return out
