"""Checkpoint / resume for reduced models.

The reference has no checkpointing (SURVEY.md §5); its natural checkpoint
artifact is the tuple the API already returns — ``(q, a0_r, a1_r, a2_r,
b_r)`` (implementation.py:186) — precisely so a caller can re-sweep any
grid without rebuilding the basis. This module persists that artifact.

Coefficient callables are code, not data: they are NOT serialized. Loading
takes them as arguments (defaulting to the wave-equation form, matching
`morfem`'s defaults).
"""

from __future__ import annotations

import json
import os
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

_FORMAT_VERSION = 1


def _normalize_path(path: str) -> str:
    """np.savez appends '.npz' when absent; mirror that in load so
    save('model') / load('model') round-trips (ADVICE r1)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_reduced_model(path: str, rm: ReducedModel, metadata: Optional[dict] = None):
    """Persist a ReducedModel to a single .npz file (host-side)."""
    meta = {"format_version": _FORMAT_VERSION}
    if metadata:
        meta.update(metadata)
    path = _normalize_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        domain=np.asarray(rm.domain),
        q=np.asarray(rm.q),
        r0=np.asarray(rm.r0),
        r1=np.asarray(rm.r1),
        r2=np.asarray(rm.r2),
        b_r=np.asarray(rm.b_r),
        ncols=np.asarray(rm.ncols),
        meta=json.dumps(meta),
    )


def load_reduced_model(
    path: str,
    t_a0=_default_t_a0,
    t_a1=_default_t_a1,
    t_a2=_default_t_a2,
    t_b=_default_t_b,
) -> ReducedModel:
    """Load a ReducedModel; coefficient callables are supplied by the caller."""
    z = np.load(_normalize_path(path), allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported reduced-model format: {meta.get('format_version')}"
        )
    return ReducedModel(
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
