"""Profiling / model statistics.

TPU-native replacement for the reference's forward-hook FLOPs counter
(reference mmdet/utils/flops_counter.py:50-433, params printed at startup
tools/test_eval_vpq.py:104-106): parameter counts from the pytree, FLOPs
from XLA's own cost analysis of the jitted computation, and a wall-clock
timing harness that fences with a device->host readback (plain
``block_until_ready`` is asynchronous on tunneled platforms).
``jax.profiler`` trace capture replaces per-phase print timers
(reference lib/utils/timer.py, tools/eval_vpq.py:300-564).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np


def count_params(params) -> int:
    import jax

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def params_to_string(n: int) -> str:
    """Reference format (mmdet/utils/flops_counter.py:103)."""
    if n >= 1e6:
        return f"{n / 1e6:.2f} M"
    if n >= 1e3:
        return f"{n / 1e3:.2f} k"
    return str(n)


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes from the XLA-compiled computation."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per device
        costs = costs[0]
    return {
        "flops": costs.get("flops", float("nan")),
        "bytes_accessed": costs.get("bytes accessed", float("nan")),
    }


def time_fn(fn: Callable, *args, iters: int = 8, warmup: int = 2) -> float:
    """Median-free mean wall time per call, fenced by readback."""
    import jax

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
