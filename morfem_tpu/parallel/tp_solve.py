"""Tensor-parallel snapshot solves: row-sharded operators over the mesh.

For N beyond a single chip's dense-LU reach (~30k DOF), the snapshot
solves become the scaling bottleneck. This module shards the OPERATOR
ROWS across the 'tp' mesh axis and solves matrix-free with Krylov
iterations whose only distributed primitive is the row-parallel matvec:

    y = all_gather_tp( A_local @ x )        A_local: [N/tp, N] per device

Krylov vectors stay replicated (they are [N, M]-small relative to the
operator); every device redundantly performs the O(N·M) vector updates
while the O(N²/tp·M) matvec — the actual cost — is distributed. This is
the textbook row-parallel layout; XLA turns the all_gather into ICI
collectives.

The same caveat as `morfem_tpu.ops.sparse` applies: Jacobi-preconditioned
Krylov wants diagonally-dominant / definite operators. For strongly
indefinite in-band Helmholtz pencils with BANDED structure, the solved
answer is `parallel/tp_banded.py` — SPIKE distributed banded DIRECT
solves over the same 'tp' axis (`SpikeBandedOperator`;
`solve_point_iterative(method="auto")` routes to it whenever the
operator carries a mesh). This module remains the dense/unstructured
row-parallel fallback; its Krylov robustness limits are inherent to the
preconditioner, not missing work. The solver reports achieved
residuals.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG


def tp_matvec_fn(mesh: Mesh, axis: str = "tp"):
    """Build the row-parallel matvec: (a_sharded [N,N], x [N,M]) → [N,M]."""

    def local(a_loc, x):
        y_loc = jnp.matmul(a_loc, x, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.all_gather(y_loc, axis, axis=0, tiled=True)

    return shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P(),
        check_vma=False,
    )


def tp_solve(
    a: jax.Array,  # [N, N] PRE-symmetrized system matrix
    b: jax.Array,  # [N, M]
    mesh: Mesh,
    axis: str = "tp",
    tol: float = 1e-10,
    maxiter: int = 2000,
    method: str = "bicgstab",
) -> Tuple[jax.Array, jax.Array]:
    """Row-sharded matrix-free solve of A·x = b over the mesh.

    The matrix should already include the (A+Aᵀ)/2 symmetrization —
    pre-symmetrizing once avoids a distributed transpose-matvec. Returns
    (x [N, M], relres [M]).
    """
    a = jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P(axis, None))
    )
    mv = tp_matvec_fn(mesh, axis)
    diag = jnp.diagonal(a)
    safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)

    def precond(x_blk):
        # Jacobi; works for [N] columns (gmres) and [N, M] blocks (bicgstab)
        return x_blk / (safe[:, None] if x_blk.ndim == 2 else safe)

    if method == "gmres":
        # Route through ops/krylov.gmres: jax.scipy's gmres builds a
        # transpose of the matvec (impossible for shard_map/Pallas
        # operators) and vmapping it would batch the operator — the exact
        # trap ops/krylov.py exists to avoid.
        from morfem_tpu.ops.krylov import gmres

        x, _ = gmres(
            lambda xx: mv(a, xx), b, precond=precond, tol=tol,
            maxiter=max(1, maxiter // 32), restart=32,
        )
    else:
        from morfem_tpu.ops.krylov import bicgstab

        x, _ = bicgstab(lambda xx: mv(a, xx), b, precond=precond, tol=tol,
                        maxiter=maxiter)
    r = b - mv(a, x)
    relres = jnp.linalg.norm(r, axis=0) / jnp.maximum(
        jnp.linalg.norm(b, axis=0), 1e-300
    )
    return x, relres


def tp_snapshot_basis(
    sys,
    seed_ts: jax.Array,
    mesh: Mesh,
    config: MorfemConfig = DEFAULT_CONFIG,
    axis: str = "tp",
    tol: float = 1e-10,
    method: str = "bicgstab",
):
    """Row-sharded equally-distributed snapshot basis + tp projection.

    The full large-N pipeline over the mesh: iterative snapshot solves with
    the row-parallel matvec, CholeskyQR orthonormalization (Gram psum over
    the mesh happens inside the sharded matmuls), and the tp projection
    from `tp_operator_images_and_project`.

    Returns (q [N, S·M], (r0, r1, r2), b_r, worst_relres).
    """
    from morfem_tpu.ops.orthonormalize import orthonormalize_svd
    from morfem_tpu.parallel.sharded import tp_operator_images_and_project

    snaps = []
    worst = 0.0
    for i in range(seed_ts.shape[0]):
        t = seed_ts[i]
        c, cb = sys.coefficients(t)
        a = c[0] * sys.a0 + c[1] * sys.a1 + c[2] * sys.a2
        if config.symmetrize:
            a = (a + a.T) * 0.5
        x, relres = tp_solve(
            a, cb * sys.b, mesh, axis=axis, tol=tol, method=method
        )
        worst = max(worst, float(jnp.max(relres)))
        snaps.append(x)
    q = orthonormalize_svd(jnp.concatenate(snaps, axis=1))
    u, rs, b_r = tp_operator_images_and_project(
        sys.operators(), sys.b, q, mesh, axis=axis
    )
    if worst > max(tol * 100, 1e-8):
        import warnings

        warnings.warn(
            f"tp snapshot solves reached only {worst:.1e} relative residual",
            stacklevel=2,
        )
    return q, rs, b_r, worst
