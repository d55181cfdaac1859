"""Observability: throughput meters + structured logging.

The reference's entire instrumentation is one wall-clock printout
(include/Renderer.hpp:294-299) and a tile-launch counter (:284-285).  Here
every render phase reports a structured record — paths/s, rays/s (paths x
mean bounces), device, elapsed — as JSON lines, the SURVEY.md S5 "metrics"
requirement.  ``jax.profiler`` tracing hooks are exposed for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class Meter:
    """Phase timer + throughput meter emitting one JSON line per phase."""

    def __init__(self, stream=None, enabled: bool = True):
        self.stream = stream or sys.stderr
        self.enabled = enabled
        self.records = []

    def emit(self, record: dict) -> None:
        self.records.append(record)
        if self.enabled:
            print(json.dumps(record), file=self.stream, flush=True)

    @contextlib.contextmanager
    def phase(self, name: str, paths: int | None = None, bounces: int | None = None):
        t0 = time.time()
        yield
        dt = time.time() - t0
        rec = {"phase": name, "elapsed_s": round(dt, 4)}
        if paths:
            rec["paths"] = paths
            rec["paths_per_sec"] = round(paths / dt, 1)
            if bounces:
                rec["ray_segments_per_sec"] = round(paths * bounces / dt, 1)
        self.emit(rec)


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """Optional jax.profiler trace (view in TensorBoard/Perfetto)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
