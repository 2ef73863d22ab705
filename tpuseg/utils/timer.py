"""Hierarchical wall-clock timers (Yolact.jittor utils/timer.py parity).

The reference's FPS numbers (README.md:209-221) come from this surface:
``timer.env('name')`` contexts accumulate per-stage totals; ``print_stats``
dumps the table. Device work is asynchronous under JAX, so callers must
``jax.block_until_ready`` inside the env for meaningful device timings.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_disabled: set[str] = set()
_start = time.perf_counter()


def reset() -> None:
    global _start
    _totals.clear()
    _counts.clear()
    _start = time.perf_counter()


def disable(name: str) -> None:
    _disabled.add(name)


def enable(name: str) -> None:
    _disabled.discard(name)


@contextmanager
def env(name: str):
    if name in _disabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _totals[name] += time.perf_counter() - t0
        _counts[name] += 1


def total_time() -> float:
    return time.perf_counter() - _start


def print_stats() -> str:
    lines = []
    name_w = max([len(k) for k in _totals] + [8])
    header = f" {'Name'.ljust(name_w)} | {'Calls':>7} | {'Total (ms)':>11} | {'Avg (ms)':>9}"
    lines.append(header)
    lines.append("-" * len(header))
    for name in sorted(_totals, key=lambda k: -_totals[k]):
        t = _totals[name] * 1000
        c = _counts[name]
        lines.append(
            f" {name.ljust(name_w)} | {c:>7} | {t:>11.2f} | {t / max(c, 1):>9.3f}")
    out = "\n".join(lines)
    print(out)
    return out
