"""Tracing / profiling utilities.

The reference has none (SURVEY.md §5.1: tqdm counters and a commented-out
shape printer). Here: jax.profiler trace capture (Perfetto/XSpace dumps),
named stage timers for the host pipeline, and a device-timing helper that
is correct on the experimental axon platform (whose block_until_ready does
not block — sync happens via a host fetch of one output element).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view in Perfetto / TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation context manager)."""
    return jax.profiler.TraceAnnotation(name)


def device_sync(out) -> None:
    """Reliably wait for device results: fetch one element of each leaf
    (axon's block_until_ready is a no-op — see docstring)."""
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "shape"):
            np.asarray(leaf).ravel()[:1]


def time_jitted(fn, args, iters: int = 10, warmup: int = 1) -> float:
    """Steady-state seconds/call of a jitted fn (chained dispatch, one
    trailing sync)."""
    for _ in range(warmup):
        out = fn(*args)
    device_sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - start) / iters


class StageTimers:
    """Accumulating wall-clock timers for host pipeline stages.

    with timers.stage("decode"): ...
    print(timers.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        return json.dumps({
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / max(self.counts[k], 1), 4)}
            for k, v in sorted(self.totals.items())
        })
