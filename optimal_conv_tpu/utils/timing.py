"""Per-stage wall-clock spans — the reference's time.Now()/Since printf
instrumentation (SURVEY.md §5 tracing) as a reusable registry, plus a
hook point for the JAX profiler."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Spans:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:24s} {self.totals[name]:9.3f}s  "
                         f"×{self.counts[name]}")
        return "\n".join(lines)


GLOBAL = Spans()
span = GLOBAL.span
