"""Synthetic test systems.

The reference's only reusable fixture generator is ``diagonal_heavy_matrix``
(experiments.py:9-24): a random banded matrix whose nonzero density decays
geometrically away from the main diagonal. The bundled waveguide matrices
(data/Ct.npy, data/Tt.npy) are absent from the mount
(.MISSING_LARGE_BLOBS:1-2), so synthetic systems also stand in for the
waveguide-shaped acceptance problem.

All generators are deterministic (jax.random keyed) and return dense
arrays; `morfem_tpu.ops.sparse` can convert to BCOO for the large-N paths.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def diagonal_heavy_matrix(
    key: jax.Array,
    size: int,
    max_abs_value: float = 10.0,
    density: float = 0.5,
    dtype=jnp.float64,
) -> jax.Array:
    """Random matrix with nonzeros concentrated around the diagonal.

    Same intent as the reference generator (experiments.py:9-24): the
    probability that the d-th off-diagonal is populated decays
    geometrically with |d|, and populated diagonals are scaled by the same
    decaying factor, so the matrix is diagonally heavy (well suited as an
    invertible FEM-like stand-in). Implemented dense + vectorized instead
    of the reference's per-diagonal Python loop.
    """
    density = float(min(max(density, 0.0), 1.0))
    k_vals, k_keep = jax.random.split(key)
    i = np.arange(size)
    dist = np.abs(i[:, None] - i[None, :])  # |row - col| ∈ [0, size-1]
    # Geometric decay of keep-probability and magnitude with distance from
    # the diagonal (reference: np.geomspace(1, 1+density, size-1) - 1,
    # experiments.py:11-13); the main diagonal is always kept at weight 1.
    band = np.geomspace(1.0, 1.0 + density, num=max(size, 2)) - 1.0
    decay = np.where(dist == 0, 1.0, band[np.clip(size - 1 - dist, 0, size - 1)])
    decay = jnp.asarray(decay, dtype)
    vals = jax.random.uniform(
        k_vals, (size, size), dtype=dtype, minval=-max_abs_value,
        maxval=max_abs_value,
    )
    # one keep/drop decision per diagonal band, like the reference's
    # per-diagonal coin flip (experiments.py:17)
    keep_band = jax.random.uniform(k_keep, (size,), dtype=dtype)
    keep = keep_band[jnp.asarray(dist)] <= decay
    return vals * decay * keep.astype(dtype)


def random_affine_system(
    key: jax.Array,
    n: int = 64,
    m: int = 2,
    num_points: int = 32,
    t_lo: float = 3.0,
    t_hi: float = 5.0,
    dtype=jnp.float64,
    symmetric: bool = True,
) -> Tuple[jax.Array, ...]:
    """A well-posed random parametric affine system for tests.

    Builds (domain, a0, a1, a2, b) such that
    A(t) = a0 + t·a1 + t²·a2 is safely invertible over [t_lo, t_hi]:
    a0 gets a dominant diagonal shift. Mirrors the reference experiment
    setup (experiments.py:45-66) but deterministic and reproducible.
    """
    k0, k1, k2, kb = jax.random.split(key, 4)
    scale = 1.0 / n

    def mat(k):
        a = jax.random.normal(k, (n, n), dtype=dtype) * scale
        if symmetric:
            a = (a + a.T) * 0.5
        return a

    a0 = mat(k0) + jnp.eye(n, dtype=dtype) * (2.0 + t_hi**2)
    a1 = mat(k1)
    a2 = mat(k2)
    b = jax.random.normal(kb, (n, m), dtype=dtype)
    domain = jnp.linspace(t_lo, t_hi, num_points, dtype=dtype)
    return domain, a0, a1, a2, b


def waveguide_like_system(
    key: jax.Array,
    n: int = 512,
    m: int = 2,
    num_points: int = 100,
    f_lo: float = 3e9,
    f_hi: float = 5e9,
    dtype=jnp.float64,
):
    """Synthetic stand-in for the bundled waveguide problem.

    Shaped like the real data pipeline (main.py:18-26): a stiffness-like
    matrix C (SPD, scaled so eigenvalues bracket the (2πf/c)² range), a
    mass-like matrix T, B sparse-ish port excitation columns, and the
    C − (2πf/c)²·T parametrization handled by the caller's coefficient
    functions. Guaranteed to make A(f) = C + f²·Γ nonsingular across the
    band while giving the frequency response nontrivial variation.
    """
    from scipy.constants import c as c_lightspeed

    kc, kt, kb = jax.random.split(key, 3)
    # SPD stiffness-like matrix via banded random factor
    g = jax.random.normal(kc, (n, n), dtype=dtype) / jnp.sqrt(n * 1.0)
    c_mat = jnp.matmul(
        g, g.T, precision=jax.lax.Precision.HIGHEST
    ) + 2.0 * jnp.eye(n, dtype=dtype)
    t = jax.random.normal(kt, (n, n), dtype=dtype) / jnp.sqrt(n * 1.0)
    t_mat = jnp.matmul(
        t, t.T, precision=jax.lax.Precision.HIGHEST
    ) + jnp.eye(n, dtype=dtype)
    # scale so that C - k0² T transitions sign over the band like a cavity
    k_mid = 2 * np.pi * 0.5 * (f_lo + f_hi) / c_lightspeed
    c_mat = c_mat * (k_mid**2)
    # sparse-ish B: a few nonzero entries per port column (like WP.npy's
    # 38 nonzeros over 3411×2)
    nnz = max(4, n // 64)
    b = np.zeros((n, m))
    rng = np.random.default_rng(np.asarray(jax.random.key_data(kb))[-1])
    for j in range(m):
        rows = rng.choice(n, size=nnz, replace=False)
        b[rows, j] = rng.uniform(0.5, 1.0, size=nnz)
    b = jnp.asarray(b, dtype)
    gamma = -t_mat * ((2 * np.pi / c_lightspeed) ** 2)
    domain = jnp.linspace(f_lo, f_hi, num_points, dtype=dtype)
    return domain, c_mat, gamma, b
