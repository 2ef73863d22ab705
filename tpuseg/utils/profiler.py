"""Profiling helpers (the jt.profiler / utils/timer.py device-side analog).

Wraps jax.profiler for kernel-level traces (viewable in TensorBoard /
Perfetto) plus a simple steady-state throughput measurer used by bench.py
and the engines' FPS reporting.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpuseg_trace"):
    """Capture a device trace: ``with profiler.trace(): run_model()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"trace written to {log_dir}")


def measure_throughput(fn, *args, iters: int = 20, warmup: int = 3,
                       items_per_call: int = 1):
    """Steady-state wall clock -> (items/s, ms/call)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return items_per_call / dt, dt * 1e3
