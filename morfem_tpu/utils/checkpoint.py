"""Checkpoint / resume for reduced models.

The reference has no checkpointing (SURVEY.md §5); its natural checkpoint
artifact is the tuple the API already returns — ``(q, a0_r, a1_r, a2_r,
b_r)`` (implementation.py:186) — precisely so a caller can re-sweep any
grid without rebuilding the basis. This module persists that artifact.

Coefficient callables are code, not data: they are NOT serialized. Loading
takes them as arguments (defaulting to the wave-equation form, matching
`morfem`'s defaults). To catch the silent-wrong-sweep failure mode — a
caller reloading with different coefficients than the model was built
with (e.g. forgetting the waveguide ``t_b`` kte override) — the save
records a COEFFICIENT FINGERPRINT: the values of (t_a0, t_a1, t_a2, t_b)
at a few probe points of the domain. Load re-evaluates the supplied
callables at the stored probes and warns on mismatch.
"""

from __future__ import annotations

import json
import os
import warnings
from typing import Optional

import jax.numpy as jnp
import numpy as np

from morfem_tpu.mor.reduced import ReducedModel
from morfem_tpu.system import (
    _default_t_a0,
    _default_t_a1,
    _default_t_a2,
    _default_t_b,
)

_FORMAT_VERSION = 2
_N_PROBES = 5


def _normalize_path(path: str) -> str:
    """np.savez appends '.npz' when absent; mirror that in load so
    save('model') / load('model') round-trips (ADVICE r1)."""
    return path if path.endswith(".npz") else path + ".npz"


def _probe_points(domain: np.ndarray) -> np.ndarray:
    idx = np.linspace(0, len(domain) - 1, min(_N_PROBES, len(domain)))
    return domain[idx.astype(int)]


def _fingerprint(rm: ReducedModel, probes: np.ndarray) -> np.ndarray:
    ts = jnp.asarray(probes)
    rows = []
    for fn in (rm.t_a0, rm.t_a1, rm.t_a2, rm.t_b):
        rows.append(np.asarray(jnp.broadcast_to(fn(ts), ts.shape), complex))
    return np.stack(rows)  # [4, n_probes] complex


def save_reduced_model(path: str, rm: ReducedModel, metadata: Optional[dict] = None):
    """Persist a ReducedModel to a single .npz file (host-side).

    Alongside the arrays, the coefficient functions' VALUES at a few
    probe points are stored so `load_reduced_model` can detect a reload
    with different coefficients (wrong-``t_b`` serving, VERDICT r2 #7).
    """
    meta = {"format_version": _FORMAT_VERSION}
    if metadata:
        meta.update(metadata)
    path = _normalize_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    probes = _probe_points(np.asarray(rm.domain))
    np.savez(
        path,
        domain=np.asarray(rm.domain),
        q=np.asarray(rm.q),
        r0=np.asarray(rm.r0),
        r1=np.asarray(rm.r1),
        r2=np.asarray(rm.r2),
        b_r=np.asarray(rm.b_r),
        ncols=np.asarray(rm.ncols),
        coeff_probes=probes,
        coeff_fingerprint=_fingerprint(rm, probes),
        meta=json.dumps(meta),
    )


def load_reduced_model(
    path: str,
    t_a0=_default_t_a0,
    t_a1=_default_t_a1,
    t_a2=_default_t_a2,
    t_b=_default_t_b,
    check_coefficients: bool = True,
    rtol: float = 1e-9,
) -> ReducedModel:
    """Load a ReducedModel; coefficient callables are supplied by the caller.

    When the checkpoint carries a coefficient fingerprint (format ≥ 2)
    and ``check_coefficients`` is on, the supplied callables are
    evaluated at the stored probe points; a relative mismatch beyond
    ``rtol`` raises a UserWarning naming the offending coefficient —
    the resulting sweeps would be silently wrong otherwise.
    """
    z = np.load(_normalize_path(path), allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    version = meta.get("format_version")
    if version not in (1, _FORMAT_VERSION):
        raise ValueError(f"unsupported reduced-model format: {version}")
    rm = ReducedModel(
        domain=jnp.asarray(z["domain"]),
        q=jnp.asarray(z["q"]),
        r0=jnp.asarray(z["r0"]),
        r1=jnp.asarray(z["r1"]),
        r2=jnp.asarray(z["r2"]),
        b_r=jnp.asarray(z["b_r"]),
        ncols=jnp.asarray(z["ncols"]),
        t_a0=t_a0,
        t_a1=t_a1,
        t_a2=t_a2,
        t_b=t_b,
    )
    if check_coefficients and version >= 2 and "coeff_fingerprint" in z:
        probes = np.asarray(z["coeff_probes"])
        saved = np.asarray(z["coeff_fingerprint"])
        now = _fingerprint(rm, probes)
        names = ("t_a0", "t_a1", "t_a2", "t_b")
        for i, name in enumerate(names):
            scale = max(float(np.max(np.abs(saved[i]))), 1e-300)
            err = float(np.max(np.abs(now[i] - saved[i]))) / scale
            if err > rtol:
                warnings.warn(
                    f"coefficient {name} supplied at load differs from the "
                    f"one the model was built with (rel mismatch {err:.1e} "
                    "at the stored probe points) — sweeps from this model "
                    "will be wrong; pass the original coefficient callables "
                    "or load with check_coefficients=False to silence",
                    stacklevel=2,
                )
    return rm
