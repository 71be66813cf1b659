"""Timing and tracing harness — the reference's StopWatch, TPU-aware.

The reference vendors NVIDIA's ``StopWatchInterface``
(include/cuda_toolkit/helper_timer.h:28-60) and takes per-update wall
clocks in its benchmark (test/dataset_main.cpp:101-135).  On this stack two
things change: (1) dispatch is asynchronous and, on the tunneled backend,
``block_until_ready`` returns before execution — only a device->host
transfer drains the queue, so ``Timer`` forces with a scalar fetch; (2) a
fixed multi-millisecond host<->device round trip dominates single-call
timings, so ``Timer.amortized`` reports marginal per-call time over a
chained batch (the honest device-throughput number).

``trace`` wraps ``jax.profiler`` for deep dives (view with TensorBoard or
Perfetto); ``MetricsLog`` accumulates the per-frame stats dict into
newline-delimited JSON (the structured-metrics analog of the reference's
stdout logging, src/depthmap_node.cpp:119-123).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable


def force(x) -> float:
    """Drain the device queue through a scalar fetch; returns the scalar."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


class Timer:
    """Wall-clock statistics collector (mean/var like dataset_main's
    report), with an honest amortized mode for async backends."""

    def __init__(self):
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.samples) / max(len(self.samples), 1)

    @property
    def var(self) -> float:
        m = self.mean
        return sum((s - m) ** 2 for s in self.samples) / max(len(self.samples), 1)

    def report(self) -> dict:
        return {"n": len(self.samples), "mean_s": self.mean, "var_s": self.var}

    @staticmethod
    def amortized(fn: Callable[[int], object], n: int = 16, repeats: int = 2) -> float:
        """Marginal seconds per call of ``fn(i)`` (an async device dispatch
        returning an array), excluding the fixed round-trip latency: time a
        chain of n calls drained once, subtract a 1-call chain."""

        def run(k):
            t0 = time.perf_counter()
            acc = None
            for i in range(k):
                r = fn(i)
                acc = r if acc is None else acc + r
            force(acc)
            return time.perf_counter() - t0

        run(1)  # warm
        t1 = min(run(1) for _ in range(repeats + 1))
        tn = min(run(n) for _ in range(repeats))
        return max((tn - t1) / (n - 1), 0.0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/remode_trace"):
    """jax.profiler trace around a block (open in TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Append-only NDJSON log of per-frame metric dicts."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.rows: list[dict] = []
        self._fh = open(path, "a") if path else None

    def log(self, frame: int, stats: dict) -> dict:
        row = {"frame": frame}
        for k, v in stats.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self.rows.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        return row

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
