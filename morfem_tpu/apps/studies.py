"""Parameter studies: basis-size tradeoff and problem upscaling.

Counterparts of the reference's study scripts:

* ``speed_and_error_of_no_points_in_q.py`` — error & wall time vs the number
  of equally-distributed seed points (3..29). The reference script is stale
  (calls signatures that no longer exist, loads a file with the wrong case;
  SURVEY.md §2 #24) — its *intent* is implemented here, TPU-style: all basis
  sizes are evaluated in ONE batched program. Every unique seed frequency is
  snapshot-solved exactly once; each size's basis lives in a padded
  [N, K_max] buffer with a column mask, and orthonormalization, projection
  and the reduced sweeps run vmapped over the size axis.

* ``fake_interpolate_bigger_sample.py`` — block-diagonal tiling of the
  system to synthesize a `rate`×-larger stress problem. (The reference also
  has a buggy/incomplete bilinear upscaler, interpolate_bigger_sample.py;
  `upscale_interpolate` implements its intent.) The reference's
  ``new_gamma = fake_interpolate(c, ...)`` bug — tiling C where Γ was
  intended (fake_interpolate_bigger_sample.py:25) — is fixed: each operator
  tiles itself.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.reduced import ReducedModel, assemble_reduced, solve_reduced_batch
from morfem_tpu.ops.orthonormalize import orthonormalize_svd_masked
from morfem_tpu.ops.solve import solve_batch
from morfem_tpu.system import AffineSystem


class BasisSizeStudy(NamedTuple):
    sizes: np.ndarray  # [S] number of seed points per variant
    ncols: np.ndarray  # [S] basis column counts (= sizes · M)
    x: jax.Array  # [S, I, K_max, M] reduced solutions (padded)
    q: jax.Array  # [S, N, K_max] padded bases
    rel_error: np.ndarray  # [S] relative solution error vs full-order


def basis_size_study(
    sys: AffineSystem,
    sizes: Sequence[int],
    config: MorfemConfig = DEFAULT_CONFIG,
    x_full: jax.Array | None = None,
) -> BasisSizeStudy:
    """Evaluate equally-distributed MOR accuracy for many basis sizes at once.

    Args:
      sys: the affine system.
      sizes: seed-point counts to evaluate (e.g. range(3, 30), matching the
        reference study's 3..29, speed_and_error_of_no_points_in_q.py:12).
      config: solver configuration.
      x_full: optional precomputed full-order sweep [I, N, M] (the oracle);
        computed here if omitted.

    Returns:
      BasisSizeStudy with per-size relative solution errors.
    """
    sizes = np.asarray(sorted(sizes))
    i_pts = sys.num_points
    m = sys.m
    n = sys.n
    k_max = int(sizes.max()) * m

    # union of seed indices over all sizes → each snapshot solved once
    per_size_idx = [
        np.linspace(0, i_pts - 1, int(s)).astype(int) for s in sizes
    ]
    unique_idx = np.unique(np.concatenate(per_size_idx))
    pos = {int(t): j for j, t in enumerate(unique_idx)}

    snaps = solve_batch(sys, sys.domain[jnp.asarray(unique_idx)], config)
    # snaps: [U, N, M] → column bank [N, U·M]
    bank = jnp.moveaxis(snaps, 0, 1).reshape(n, -1)

    # gather each size's snapshot columns into a padded [N, K_max] buffer
    gather_cols = np.zeros((len(sizes), k_max), dtype=np.int32)
    valid = np.zeros((len(sizes), k_max), dtype=bool)
    for si, idx in enumerate(per_size_idx):
        cols = np.concatenate(
            [np.arange(m) + pos[int(t)] * m for t in idx]
        )
        gather_cols[si, : len(cols)] = cols
        valid[si, : len(cols)] = True

    q_stack = bank[:, jnp.asarray(gather_cols)]  # [N, S, K_max]
    q_stack = jnp.moveaxis(q_stack, 1, 0) * jnp.asarray(valid)[:, None, :]
    ncols = jnp.asarray(sizes * m)

    q_orth = jax.vmap(orthonormalize_svd_masked)(q_stack, ncols)

    # batched projection: r_p [S, K, K], b_r [S, K, M]
    # plain transpose projection (see mor/reduced.py docstring);
    # N-axis contractions routed through the chunked-precision matmul
    from morfem_tpu.ops.precision import precise_matmul

    qt = jnp.swapaxes(q_orth, -1, -2)
    rs = [
        jax.vmap(lambda qs, qts: precise_matmul(qts, precise_matmul(op, qs)))(
            q_orth, qt
        )
        for op in sys.operators()
    ]
    b_r = jax.vmap(lambda qts: precise_matmul(qts, sys.b))(qt)

    def sweep_one(r0, r1, r2, br, nc, q):
        rm = ReducedModel(
            domain=sys.domain, q=q, r0=r0, r1=r1, r2=r2, b_r=br, ncols=nc,
            t_a0=sys.t_a0, t_a1=sys.t_a1, t_a2=sys.t_a2, t_b=sys.t_b,
        )
        a, rhs = assemble_reduced(rm, sys.domain, config)
        return solve_reduced_batch(a, rhs, config)

    x = jax.vmap(sweep_one)(rs[0], rs[1], rs[2], b_r, ncols, q_orth)

    if x_full is None:
        from morfem_tpu.ops.solve import solve_sweep

        x_full = solve_sweep(sys, config)
    rec = jnp.einsum(
        "snk,sikm->sinm", q_orth, x,
        precision=jax.lax.Precision.HIGHEST,
    )
    denom = jnp.linalg.norm(x_full)
    rel = jnp.sqrt(
        jnp.sum(jnp.abs(rec - x_full[None]) ** 2, axis=(1, 2, 3))
    ) / denom

    return BasisSizeStudy(
        sizes=sizes,
        ncols=np.asarray(ncols),
        x=x,
        q=q_orth,
        rel_error=np.asarray(rel),
    )


def upscale_block_diag(
    mats: Sequence[np.ndarray], b: np.ndarray, rate: int
) -> Tuple[list, np.ndarray]:
    """Synthesize a `rate`×-larger system by block-diagonal tiling.

    Counterpart of the reference's ``fake_interpolate``
    (fake_interpolate_bigger_sample.py:1-34): each operator is placed
    `rate` times along the diagonal of a (rate·N)² zero matrix and B is
    stacked vertically. (The reference bug of tiling C in Γ's place is not
    reproduced.)
    """
    out = []
    for a in mats:
        a = np.asarray(a)
        n = a.shape[0]
        big = np.zeros((rate * n, rate * n), dtype=a.dtype)
        for r in range(rate):
            big[r * n : (r + 1) * n, r * n : (r + 1) * n] = a
        out.append(big)
    b = np.asarray(b)
    b_big = np.tile(b, (rate, 1))
    return out, b_big


def upscale_interpolate(a: np.ndarray, rate: float) -> np.ndarray:
    """Bilinear upscaling of an operator to synthesize a larger system.

    Intent of the reference's (buggy, incomplete) interp2d upscaler
    (interpolate_bigger_sample.py:1-41): resample the matrix onto a
    rate×-finer index grid. Symmetry is restored after resampling.
    """
    a = jnp.asarray(a)
    n = a.shape[0]
    new_n = int(round(n * rate))
    big = jax.image.resize(a, (new_n, new_n), method="bilinear")
    return np.asarray((big + big.T) / 2)
