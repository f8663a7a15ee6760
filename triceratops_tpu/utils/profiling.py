"""Profiling and throughput instrumentation.

The reference has no tracing (performance was measured with notebook
%%time cells — SURVEY.md section 5.1); here a thin harness exposes:

* ``trace(logdir)`` — context manager around ``jax.profiler`` for
  XLA/TPU traces viewable in TensorBoard/Perfetto.
* ``throughput(fn, *args, draws, repeats)`` — wall time and
  scenario-draws/second for a jitted callable (the BASELINE.md metric).
* ``timed(label)`` — lightweight wall-clock section timer.
"""

from __future__ import annotations

import contextlib
import time as _time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/triceratops_tpu_trace"):
    """jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "section", printer=print):
    t0 = _time.perf_counter()
    yield
    printer(f"[{label}] {_time.perf_counter() - t0:.3f}s")


def throughput(fn, *args, draws: int, repeats: int = 3, warmup: int = 1,
               **kwargs):
    """(best wall seconds, draws/second) for a jitted callable.

    ``draws`` is the number of scenario-draws the call evaluates (the
    BASELINE.md unit: one draw = one supersampled model light curve +
    chi^2)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        t0 = _time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, _time.perf_counter() - t0)
    return best, draws / best
