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


def sync(*arrays):
    """Force completion of the computations producing `arrays`.

    jax.block_until_ready is a NO-OP on the axon remote-TPU backend
    (measured: it returns in ~0.05 ms while the enqueued transform is
    still running — every timing taken with it is an enqueue time, not
    a device time).  Pulling one element to the host is the only
    reliable sync, so benchmarks must call this instead.
    """
    import numpy as np
    for a in arrays:
        if hasattr(a, "c0"):          # Ciphertext — drain its device half
            a = a.c0
        if hasattr(a, "shape"):
            flat = a.reshape(-1) if a.ndim != 1 else a
            np.asarray(flat[:1])
        elif not isinstance(a, (int, float, type(None))):
            raise TypeError(f"sync: unhandled {type(a)} — timing would "
                            "silently measure enqueue only")


def timeit_chained(fn, x0, iters: int = 10) -> float:
    """Honest per-call milliseconds for x→x device function `fn`:
    chain `iters` calls (serializing on data dependency) and sync once."""
    x = fn(x0)
    sync(x)                       # compile + drain queue
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn(x)
    sync(x)
    return (time.perf_counter() - t0) / iters * 1e3
