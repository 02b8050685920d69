"""Tracing / profiling hooks.

The reference has DEBUG-gated wall-clock phase timers (__START_TIME /
__END_TIME, hw5.cu:25-29) and an external nvprof runbook (hw5.cu:644-668).
Here: always-on phase timers collected into structured stats, plus a
jax.profiler trace context for TensorBoard-compatible device profiles.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class PhaseTimers:
    """Named wall-clock phase timers (problem1+2, problem3, io, compile)."""

    def __init__(self):
        self.phases: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self, stream=sys.stderr, **extra) -> dict:
        rec = {"phases_s": {k: round(v, 4) for k, v in self.phases.items()},
               **extra}
        print(json.dumps(rec), file=stream, flush=True)
        return rec


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """jax.profiler trace (the nvprof runbook analog). No-op if logdir is
    falsy."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield


def pair_interactions(n: int, n_steps: int, n_sims: int) -> int:
    """Total pair interactions: the engine's work metric (SURVEY.md §6).

    Step 0 performs no force evaluation (the loops only check/snapshot at
    step 0, hw5.cu:368-377), so a full simulation does n_steps force
    evaluations. An UPPER BOUND when early exit / pruning shortens runs
    (P2 break, P3 suffixes): callers should treat pairs/s derived from it
    as a lower bound on achieved throughput.
    """
    return n * n * n_steps * n_sims
