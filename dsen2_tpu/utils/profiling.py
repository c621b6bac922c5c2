"""Tracing / profiling hooks.

The reference's only observability is wall-clock prints
(training/supres_train.py:165,177-178; matlab_demo/DSen2.m:43,57 — SURVEY.md
§5.1). This module keeps that capability (Timer) and adds real profiler
integration: `trace()` wraps jax.profiler so any region can be captured for
TensorBoard/Perfetto, and `annotate()` names regions inside a trace."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["Timer", "trace", "annotate", "block_and_time"]


class Timer:
    """Wall-clock timer matching the reference's 'Elapsed time: ...' habit."""

    def __init__(self, label: str = "", verbose: bool = True):
        self.label = label
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"Elapsed time: {self.elapsed}.")


@contextlib.contextmanager
def trace(log_dir: str, host_only: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region into log_dir
    (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region for traces: with annotate('recompose'): ..."""
    return jax.profiler.TraceAnnotation(name)


def block_and_time(fn, *args, repeats: int = 1, **kwargs):
    """Run fn, blocking on ALL outputs each repeat; returns (result,
    best_seconds). Correct timing on async backends — block_until_ready on
    the output tree, not just dispatch."""
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return result, best
