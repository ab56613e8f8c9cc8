"""Phase timers + structured metrics.

The reference has no instrumentation beyond criterion timings (SURVEY.md §5).
Here every prover phase (witness gen / NTT / MSM / quotient / open) can be
wrapped in a ``phase`` context; results accumulate into a structured dict
(witnesses/s, MSM points/s/chip — the BASELINE.json metrics). Optionally
forwards to jax.profiler traces for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import time


class Phases:
    def __init__(self, use_jax_profiler: bool = False):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.meta: dict[str, dict] = {}
        self._use_jax = use_jax_profiler

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        ctx = contextlib.nullcontext()
        if self._use_jax:
            import jax

            ctx = jax.profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        if meta:
            self.meta.setdefault(name, {}).update(meta)

    def rate(self, name: str, items: int) -> float:
        """items/s for a phase (e.g. witnesses/s, MSM points/s)."""
        t = self.times.get(name, 0.0)
        return items / t if t > 0 else float("inf")

    def report(self) -> dict:
        return {
            "phases_s": {k: round(v, 4) for k, v in self.times.items()},
            "counts": self.counts,
            "meta": self.meta,
        }

    def dump(self) -> str:
        return json.dumps(self.report())
