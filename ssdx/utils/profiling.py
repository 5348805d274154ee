"""Tracing / profiling utilities (SURVEY §5 "Tracing / profiling").

The reference brackets host phases with ``time.perf_counter`` behind a
``timing`` flag (SSD_trainer.py:63-101,145-147).  Here the per-phase analog is
the loop's ``block_until_ready``-based timing dicts; this module adds the
device-level tools: an XLA profiler trace context (view in TensorBoard /
Perfetto) and a synchronizing step timer for micro-benchmarks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "StepTimer", "time_fn"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ssdx_trace"):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulate wall-clock time of device steps with proper syncing.

    >>> t = StepTimer()
    >>> with t:  # doctest: +SKIP
    ...     out = step(state, batch)
    >>> t.mean  # doctest: +SKIP
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def total(self) -> float:
        return sum(self.times)


def time_fn(fn: Callable, *args, n_warmup: int = 2, n_iters: int = 20) -> float:
    """Mean seconds per call of a jitted fn (blocks on the last output)."""
    block = lambda out: jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    for _ in range(n_warmup):
        out = fn(*args)
    block(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    block(out)
    return (time.perf_counter() - t0) / n_iters
