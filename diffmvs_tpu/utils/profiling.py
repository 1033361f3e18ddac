"""Profiling / tracing hooks (the reference had only ad-hoc wall clocks,
SURVEY.md §5.1 — this is the TPU-native upgrade).

Usage:
    with trace("stage1"):
        ...
    capture("/tmp/trace", fn, *args)   # one-shot profiler capture
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def trace(name: str):
    """jax.profiler trace annotation (shows up in xprof/tensorboard)."""
    return jax.profiler.TraceAnnotation(name)


def capture(logdir: str, fn: Callable, *args, **kwargs):
    """Run fn under a profiler trace capture; returns fn's result."""
    with jax.profiler.trace(logdir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """Blocking wall-clock timer (device-synchronized at exit)."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        if "result" in holder:
            jax.block_until_ready(holder["result"])
        holder["elapsed"] = time.perf_counter() - t0
        sink(f"{label}: {holder['elapsed']*1000:.2f} ms")
