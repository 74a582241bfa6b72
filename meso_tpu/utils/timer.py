"""Step-phase wall-clock accounting — the Timer/Pair-Neigh-Comm breakdown
analog (LAMMPS ``src/timer.cpp``/``finish.cpp``; SURVEY.md §5.1).

Phases are timed at the host-chunk boundary (inside jit everything is fused;
the meaningful split is force-loop chunks vs rebuilds vs IO). Use
``jax.profiler.trace`` for op-level depth; this gives the reference-style
summary table for free.
"""

from __future__ import annotations

import time
from collections import defaultdict


class PhaseTimer:
    """Accumulate wall-clock per named phase; print a LAMMPS-style footer."""

    def __init__(self):
        self.acc = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = None
        self._phase = None
        self.start_wall = time.perf_counter()

    def begin(self, phase: str):
        now = time.perf_counter()
        if self._phase is not None:
            self.acc[self._phase] += now - self._t0
            self.counts[self._phase] += 1
        self._phase = phase
        self._t0 = now

    def end(self):
        if self._phase is not None:
            self.acc[self._phase] += time.perf_counter() - self._t0
            self.counts[self._phase] += 1
            self._phase = None

    def summary(self) -> str:
        self.end()
        total = time.perf_counter() - self.start_wall
        lines = [f"{'Phase':<12}{'time (s)':>10}{'%':>7}{'calls':>8}"]
        for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            lines.append(f"{k:<12}{v:>10.3f}{100*v/total:>6.1f}%"
                         f"{self.counts[k]:>8}")
        lines.append(f"{'total':<12}{total:>10.3f}")
        return "\n".join(lines)
