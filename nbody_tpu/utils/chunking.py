"""Adaptive host-chunk sizing for accelerator drivers.

The TPU harness kills single device executions beyond ~5 minutes, so the
long 200001-step loops are split into host-level chunks of device work
(bit-exact: the carry passes through unchanged). Round 1 sized chunks from
a hard-coded seconds-per-pair-step constant; on a faster/slower part that
silently risks watchdog kills or 30x more host round-trips. This chunker
keeps the constant only as a SAFETY PRIOR for the probe size, then adapts
to the measured rate:

  * chunk 1 (probe size, conservative ~PROBE_SEC by the prior): includes
    jit compile time — ignored for calibration;
  * chunk 2 (probe size): steady-state — measures the true rate;
  * remaining chunks: probe << k, the largest power-of-two multiple of the
    probe that fits TARGET_SEC at the measured rate (power-of-two scaling
    keeps the set of jit signatures small: each distinct chunk length is a
    separate ~minutes remote compile on this TPU).

The rate is RE-measured on every chunk, not just the calibration one: the
compile service's code quality swings up to 4.4x within a session on this
TPU (results/ACCURACY.md, measurement-environment caveat), so a chunk sized
for a healthy epoch can drift toward the watchdog mid-run. A chunk that
runs past MAX_SEC at the latest rate halves (repeatedly) back toward the
probe; once the rate recovers, the chunk grows back — but only to sizes
already used this run, so no new jit signatures are ever introduced by the
re-measurement.

Even a 10x-mis-calibrated prior only mis-sizes the two probe chunks
(~200 s worst case, still under the watchdog); everything after runs at
measured-rate sizing.
"""

from __future__ import annotations

import math
import time


class AdaptiveChunker:
    """Yields chunk sizes (in steps) and learns from measured timings.

    est_sec_per_step: prior estimate of device seconds per step (the old
    constant times the per-step work). `timer` is injectable for tests.
    """

    PROBE_SEC = 20.0
    TARGET_SEC = 60.0
    MAX_SEC = 180.0          # stay well under the ~5-min watchdog

    def __init__(self, est_sec_per_step: float, n_steps: int, *,
                 floor: int = 250, cap: int | None = None,
                 timer=time.perf_counter):
        self._timer = timer
        self._n_steps = n_steps
        probe = int(self.PROBE_SEC / max(est_sec_per_step, 1e-12))
        probe = max(floor, min(probe, 2000, n_steps))
        if cap is not None:
            probe = min(probe, cap)
        self.probe = probe
        self.chunk = probe
        self._peak_chunk = probe
        self._calls = 0
        self._t0 = None
        self.measured_rate: float | None = None   # steps / sec

    def start(self) -> int:
        """Call immediately before dispatching a chunk; returns its size."""
        self._t0 = self._timer()
        return self.chunk

    def finish(self, steps_run: int) -> None:
        """Call after the chunk's results are materialized (blocked on)."""
        elapsed = max(self._timer() - self._t0, 1e-9)
        self._calls += 1
        if self._calls == 1 or steps_run <= 0:
            return                       # compile chunk / early exit: noise
        rate = steps_run / elapsed
        if self.measured_rate is None:
            self.measured_rate = rate
            target = rate * self.TARGET_SEC
            k = max(0, int(math.floor(math.log2(max(target, 1) / self.probe))))
            chunk = self.probe << k
            # never exceed MAX_SEC at the measured rate
            while chunk > self.probe and chunk / rate > self.MAX_SEC:
                chunk >>= 1
            self.chunk = min(chunk, self._n_steps)
            self._peak_chunk = self.chunk
            return
        # steady state: re-measure every chunk. Shrink while the latest
        # rate projects the current chunk past MAX_SEC (guards against the
        # documented mid-run compile-service slowdowns); grow back once
        # healthy, but only to sizes already used (no new jit signatures).
        self.measured_rate = rate
        while self.chunk > self.probe and self.chunk / rate > self.MAX_SEC:
            self.chunk >>= 1
        while (self.chunk * 2 <= self._peak_chunk
               and (self.chunk * 2) / rate <= self.TARGET_SEC):
            self.chunk <<= 1
