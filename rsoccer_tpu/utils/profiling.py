"""Profiling and throughput instrumentation.

The reference's only observability is ad-hoc debug prints on reward spikes
(static_defenders.py:276-280).  Here: a ``jax.profiler`` trace context for
Perfetto/XProf captures of the fused step, and a steps/s meter for rollout
loops.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rsoccer_trace"):
    """Capture a device trace viewable in Perfetto / TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/s meter: ``with Throughput(n_steps) as t: ...; t.steps_per_s``."""

    def __init__(self, total_env_steps: int):
        self.total = total_env_steps
        self.steps_per_s = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        self.steps_per_s = self.total / max(self.elapsed, 1e-9)
        return False
