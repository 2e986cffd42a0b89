"""Drop-in compatibility layer with the reference library's names.

Users of the reference import `morfem`, `ModelDefinition`,
`solve_finite_element_method` and `TimeStatistics` from
``implementation.py``. This module exposes the same names with the same
call contracts so reference scripts port with an import change:

    from morfem_tpu.compat import (
        morfem, ModelDefinition, solve_finite_element_method, TimeStatistics,
    )

Notes on fidelity:
  * `morfem(...)` — same signature, defaults and return tuple as
    implementation.py:99-186. Accepts SciPy sparse or dense operators.
  * `ModelDefinition(domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b)` — the
    reference's container (implementation.py:19-54), here an immutable
    AffineSystem factory (the reference *mutates* its instance during
    reduction; code relying on that mutation should use the returned
    reduced matrices instead).
  * `solve_finite_element_method(md)` — full-order sweep returning the
    [I, N, M] solution cube (implementation.py:189-194). NOTE: the
    reference allocates the cube as real float64 regardless of input
    dtype, silently casting complex solutions (implementation.py:190);
    here the dtype follows the inputs.
  * `TimeStatistics` — reference-style API (start_clock / add_time /
    add_custom_time / print_statistics; implementation.py:76-96) on top of
    PhaseTimer's storage, with per-instance (not class-level!) state.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

from morfem_tpu.config import DEFAULT_CONFIG, MorfemConfig
from morfem_tpu.mor.api import morfem as _morfem
from morfem_tpu.ops.solve import solve_sweep
from morfem_tpu.system import (
    AffineSystem,
    _default_t_a0,
    _default_t_a1,
    _default_t_a2,
    _default_t_b,
)

__all__ = [
    "morfem",
    "ModelDefinition",
    "solve_finite_element_method",
    "TimeStatistics",
]


def morfem(
    domain,
    a0,
    a1,
    a2,
    b,
    t_a0: Callable = _default_t_a0,
    t_a1: Callable = _default_t_a1,
    t_a2: Callable = _default_t_a2,
    t_b: Callable = _default_t_b,
    config: MorfemConfig = DEFAULT_CONFIG,
):
    """Reference-compatible entry point; returns numpy arrays.

    Same contract as implementation.py:99-186:
    ``(x [I,Nr,M], q [N,Nr], a0_r, a1_r, a2_r, b_r)``.
    """
    out = _morfem(
        domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config=config
    )
    return tuple(np.asarray(o) for o in out)


def ModelDefinition(
    domain,
    a0,
    a1,
    a2,
    b,
    t_a0: Callable = _default_t_a0,
    t_a1: Callable = _default_t_a1,
    t_a2: Callable = _default_t_a2,
    t_b: Callable = _default_t_b,
) -> AffineSystem:
    """Reference-compatible constructor (implementation.py:34-54)."""
    return AffineSystem.create(domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b)


def solve_finite_element_method(
    md: AffineSystem, config: MorfemConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """Full-order sweep (implementation.py:189-194) as numpy [I, N, M]."""
    return np.asarray(solve_sweep(md, config))


class TimeStatistics:
    """Reference-style wall-clock bucket profiler (implementation.py:76-96).

    Fixes the reference's class-level mutable state (its ``times`` dict was
    shared across instances) while keeping the exact method surface.
    """

    def __init__(self):
        self.times = {"Whole": 0.0}
        self.clock = 0.0

    def start_clock(self):
        self.clock = time.time()

    def add_time(self, time_name: str):
        if time_name not in self.times:
            self.times[time_name] = 0.0
        now = time.time()
        self.times[time_name] += now - self.clock
        self.clock = now

    def add_custom_time(self, time_name: str, custom_clock: float):
        self.times[time_name] += time.time() - custom_clock

    def print_statistics(self):
        whole = self.times.get("Whole", 0.0)
        for name, t in self.times.items():
            pct = (t / whole * 100) if whole else 0.0
            print(f"{name}: {round(t, 2)} s | {round(pct, 2)}%")
