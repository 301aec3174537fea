"""Logging / tracing — the reference's log.hpp re-imagined (SURVEY.md §5.1).

The reference has compile-time printf levels DEBUG/WARNING/TRACE/INFO
(include/spblas/detail/log.hpp:30-52) and calls ``log_trace("")`` at every
algorithm entry.  Runtime equivalent: a level filter from the
``SPBLAS_LOG`` env var, a ``@traced`` decorator on op entry points that
also opens a ``jax.profiler`` named scope (so device traces show the op
boundaries the reference's call tracer showed on host).
"""

from __future__ import annotations

import functools
import os
import sys
import time

LEVELS = {"NONE": 0, "WARNING": 1, "INFO": 2, "TRACE": 3, "DEBUG": 4}
_level = LEVELS.get(os.environ.get("SPBLAS_LOG", "NONE").upper(), 0)


def set_level(name: str) -> None:
    global _level
    _level = LEVELS[name.upper()]


def log(level: str, msg: str) -> None:
    if LEVELS[level] <= _level:
        print(f"[{level}] spblas_tpu: {msg}", file=sys.stderr)


def log_warning(msg):
    log("WARNING", msg)


def log_info(msg):
    log("INFO", msg)


def log_trace(msg):
    log("TRACE", msg)


def log_debug(msg):
    log("DEBUG", msg)


def traced(fn):
    """Entry-point tracer (log_trace at every algorithm entry, like the
    reference) + profiler named scope for device timelines."""
    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _level >= LEVELS["TRACE"]:
            t0 = time.perf_counter()
            log_trace(f"{fn.__qualname__} enter")
            with jax.named_scope(f"spblas.{fn.__name__}"):
                out = fn(*args, **kwargs)
            log_trace(f"{fn.__qualname__} exit "
                      f"({(time.perf_counter() - t0) * 1e3:.3f} ms)")
            return out
        with jax.named_scope(f"spblas.{fn.__name__}"):
            return fn(*args, **kwargs)

    return wrapper
