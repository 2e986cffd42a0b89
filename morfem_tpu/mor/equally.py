"""Equally-distributed projection-basis construction.

Counterpart of the reference's ``projection_base_equally_distributed``
(implementation.py:197-214): pick ``floor(I·(1 − reduction_rate))`` evenly
spaced domain indices, take a full-order snapshot at each, stack the
solution columns, and orthonormalize with a thin SVD.

The seed count and indices are static (derived from the domain length and
the config), so this path compiles with exact shapes — no padding or
masking needed — and all snapshot solves batch onto the MXU together.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.orthonormalize import orthonormalize_svd
from morfem_tpu.ops.solve import solve_batch
from morfem_tpu.system import AffineSystem


def seed_indices(
    num_points: int, config: MorfemConfig, count: Optional[int] = None
) -> np.ndarray:
    """Evenly spaced seed indices into the domain.

    Matches the reference's ``np.linspace(0, I-1, count, dtype=int)``
    (implementation.py:198-203; count from the reduction rate) — numpy
    truncates the intermediate floats toward zero.
    """
    if count is None:
        count = math.floor(
            num_points * (1 - config.equally_distributed_reduction_rate)
        )
    count = max(1, min(count, num_points))
    return np.linspace(0, num_points - 1, count).astype(int)


def equally_distributed_basis(
    sys: AffineSystem,
    config: MorfemConfig = DEFAULT_CONFIG,
    count: Optional[int] = None,
) -> jax.Array:
    """Build the orthonormal basis from evenly spaced snapshots.

    Returns q with exact shape [N, count·M] (no padding).
    """
    idx = seed_indices(sys.num_points, config, count)
    ts = sys.domain[jnp.asarray(idx)]
    # Chunked batch solve keeps ≤ solve_chunk N×N factorizations in HBM.
    chunk = max(1, min(config.solve_chunk, len(idx)))
    pad = (-len(idx)) % chunk
    ts_p = jnp.concatenate([ts, jnp.broadcast_to(ts[-1:], (pad,))])
    xs = lax.map(
        lambda tc: solve_batch(sys, tc, config), ts_p.reshape((-1, chunk))
    )
    xs = xs.reshape((-1,) + xs.shape[2:])[: len(idx)]  # [S, N, M]
    # Stack snapshot columns side by side: [N, S·M]
    q = jnp.moveaxis(xs, 0, 1).reshape(sys.n, -1)
    return orthonormalize_svd(q)
