"""Profiling helpers (aux subsystem; reference only has dormant logger
profile_kv helpers, diffusion/logger.py:294-309).

- profile_kv: wall-clock accumulator context manager, kv-style
- trace: wraps jax.profiler.trace for TensorBoard-viewable device traces
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_TIMINGS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def profile_kv(name: str):
    """Accumulate wall-clock under `name`; read with get_timings()."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def profile(fn):
    """Decorator form of profile_kv (reference logger.py @profile)."""

    def wrapped(*a, **kw):
        with profile_kv(fn.__name__):
            return fn(*a, **kw)

    return wrapped


def get_timings() -> dict[str, tuple[float, int]]:
    return {k: (_TIMINGS[k], _COUNTS[k]) for k in _TIMINGS}


def reset_timings() -> None:
    _TIMINGS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Device-level profiler trace (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
