"""Phase timing — the reference's ``TimeStatistics`` done right for JAX.

The reference accumulates named wall-clock buckets with manual clock
bookkeeping and prints seconds + percent of "Whole"
(implementation.py:76-96, printed at :93-96). Pitfalls it has that matter
here: class-level mutable state shared across instances, and — fatal under
JAX — wall-clocking async dispatch instead of device completion.

``PhaseTimer`` is instance-scoped, context-manager based, calls
``jax.block_until_ready`` is the *caller's* job (phases in this library
block on their outputs before closing the phase), nests, and can emit both
the reference-style text report and a structured dict. It can also wrap
phases in `jax.profiler.TraceAnnotation` so phases show up in TPU profiler
timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates named wall-clock phase buckets.

    Usage::

        timer = PhaseTimer()
        with timer.phase("offline"):
            ...  # block_until_ready inside
        print(timer.report())
    """

    def __init__(self, disabled: bool = False, trace: bool = False):
        self.times: Dict[str, float] = {}
        self.disabled = disabled
        self.trace = trace
        self._start = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.disabled:
            yield
            return
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self.trace
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def add(self, name: str, seconds: float):
        self.times[name] = self.times.get(name, 0.0) + seconds

    def total(self) -> float:
        """Wall time since construction ('Whole' in the reference)."""
        return time.perf_counter() - self._start

    def as_dict(self) -> Dict[str, float]:
        d = dict(self.times)
        d["whole"] = self.total()
        return d

    def report(self) -> str:
        """Reference-style text report: seconds and % of whole
        (implementation.py:93-96)."""
        whole = self.total()
        lines = [f"whole: {whole:.3f} s | 100.00%"]
        for name, t in self.times.items():
            pct = 100.0 * t / whole if whole > 0 else 0.0
            lines.append(f"{name}: {t:.3f} s | {pct:.2f}%")
        return "\n".join(lines)
