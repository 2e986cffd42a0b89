"""Greedy basis construction over MATRIX-FREE operators (large N).

The reference's DEFAULT basis strategy is greedy
(implementation.py:175 → :217-318); round 1 only offered the
equally-distributed `sparse_snapshot_basis` beyond dense reach, because
the greedy estimator consumed dense operators. This module closes that
gap: the direct residual estimator only ever needs operator
APPLICATIONS — U_p = A_p·Q (mor/estimator.py::estimate_errors_direct) —
which `SparseAffineOperator` (BCOO SpMM, ops/sparse.py) and
`BandedAffineOperator` (Pallas banded matvec,
ops/pallas/banded_matvec.py) both provide via ``apply_addend``.

Design — host-driven loop around jitted kernels, unlike the dense
greedy's single compiled `lax.while_loop` (mor/greedy.py). Deliberate:
the large-N snapshot solves are Krylov iterations whose trip counts are
data-dependent and whose cost dominates the loop; fusing everything into
one while_loop would force every solve to its padded worst case and
recompile the (large) BCOO constants into the loop body. The basis still
lives in a padded [N, K] buffer with an active-column count so every
jitted piece keeps ONE static shape across iterations.

Snapshot solves report their achieved residuals (Krylov on indefinite
systems can stagnate silently); a failed solve terminates the greedy
with ``converged=False`` instead of polluting the basis — failure
handling the reference has no analogue of.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.estimator import estimate_errors_direct
from morfem_tpu.mor.greedy import GreedyResult, max_basis_columns
from morfem_tpu.mor.reduced import ReducedModel
from morfem_tpu.ops.orthonormalize import (
    column_mask,
    orthonormalize_append_cgs2,
    orthonormalize_svd,
)
from morfem_tpu.ops.precision import precise_matmul
from morfem_tpu.ops.sparse import solve_point_iterative
from morfem_tpu.system import (
    _default_t_a0,
    _default_t_a1,
    _default_t_a2,
    _default_t_b,
)

_HI = jax.lax.Precision.HIGHEST


def _reduced_from_u_matfree(
    domain, q, ncols, u, b, coeffs
) -> ReducedModel:
    """Galerkin projection reusing U_p = A_p·Q (plain transpose form).

    ``coeffs`` is (t_a0, t_a1, t_a2, *t_extra, t_b) matching ``u``'s
    leading addend axis [P, N, K]; addends beyond the classic 3 land in
    ``ReducedModel.r_extra``."""
    t_a0, t_a1, t_a2, *t_extra, t_b = coeffs
    mask = column_mask(q.shape[1], ncols, q.dtype)
    qmt = (q * mask).T
    return ReducedModel(
        domain=domain,
        q=q,
        r0=precise_matmul(qmt, u[0]),
        r1=precise_matmul(qmt, u[1]),
        r2=precise_matmul(qmt, u[2]),
        b_r=precise_matmul(qmt, b),
        ncols=ncols,
        t_a0=t_a0,
        t_a1=t_a1,
        t_a2=t_a2,
        t_b=t_b,
        r_extra=tuple(precise_matmul(qmt, u[3 + j])
                      for j in range(len(t_extra))),
        t_extra=tuple(t_extra),
    )


def greedy_basis_matfree(
    op,
    b: jax.Array,
    domain: jax.Array,
    t_a0=_default_t_a0,
    t_a1=_default_t_a1,
    t_a2=_default_t_a2,
    t_b=_default_t_b,
    config: MorfemConfig = DEFAULT_CONFIG,
    snapshot_tol: float = 1e-10,
    snapshot_maxiter: int = 2000,
    method: str = "auto",
    t_extra=(),
) -> Tuple[GreedyResult, ReducedModel]:
    """Greedy MOR basis for a matrix-free affine operator.

    Counterpart of the reference's default strategy
    (implementation.py:175, :217-318) for systems beyond dense-LU reach.

    Args:
      op: operator with ``matvec(c, x)``, ``diagonal(c)`` and
        ``apply_addend(p, x)`` — `SparseAffineOperator` or
        `BandedAffineOperator`.
      b: [N, M] dense impulse part.
      domain: [I] parameter grid.
      t_a0..t_b: coefficient callables (reference defaults 1, t, t², t).
      t_extra: coefficient callables for operator addends BEYOND the
        classic 3 (the operator must carry matching extra addends) —
        how complex-coefficient systems ride the interleaved embedding
        (mor/api.py builds P=6 here).
      config: greedy knobs (threshold, max iterations, orthonormalization,
        dependency_tolerance) — `estimator` is implicitly "direct"; the
        Gram variant would square the operator scale for no benefit here.
      snapshot_tol / snapshot_maxiter / method: snapshot-solve settings
        (ops/sparse.py::solve_point_iterative). ``"auto"`` picks the
        block-tridiagonal DIRECT solver (ops/block_tridiag) for banded
        operators — required for indefinite in-band Helmholtz, where
        Krylov stagnates — and Jacobi-BiCGStab for general sparsity.

    Returns:
      (GreedyResult, trimmed ReducedModel). ``converged=False`` with fewer
      iterations than the budget means a snapshot solve failed to reach
      an acceptable residual (stagnating Krylov) or a dependent snapshot
      was produced (estimator floor reached).
    """
    coeffs = (t_a0, t_a1, t_a2, *t_extra, t_b)
    n_add = 3 + len(t_extra)
    op_n = getattr(op, "n_addends", n_add)
    if op_n != n_add:
        raise ValueError(
            f"operator has {op_n} addends but {n_add} coefficient "
            "callables were given (pass the extras via t_extra)"
        )
    b = jnp.asarray(b)
    dtype = b.dtype
    n, m = b.shape
    i_pts = int(domain.shape[0])
    domain = jnp.asarray(domain)
    k = max_basis_columns(m, config, n)
    max_iters = config.max_greedy_iterations
    rdtype = jnp.zeros((), dtype).real.dtype

    def coeff_at(t):
        t = jnp.asarray(t)
        c = jnp.stack(
            [jnp.asarray(fn(t), dtype=dtype) for fn in coeffs[:-1]]
        )
        return c, jnp.asarray(t_b(t), dtype=dtype)

    @jax.jit
    def snapshot(op, t):
        c, cb = coeff_at(t)
        return solve_point_iterative(
            op, c, cb * b, tol=snapshot_tol, maxiter=snapshot_maxiter,
            method=method, return_residual=True,
        )

    @jax.jit
    def estimate(op, q, ncols):
        mask = column_mask(k, ncols, q.dtype)
        qm = q * mask
        u = jnp.stack([op.apply_addend(p, qm) for p in range(n_add)])
        rm = _reduced_from_u_matfree(domain, q, ncols, u, b, coeffs)
        err, _ = estimate_errors_direct(rm, u, b, config)
        return err, u

    @jax.jit
    def append(q, ncols, x_new):
        # dependency guard, as in the compiled greedy (mor/greedy.py)
        mask = column_mask(k, ncols, q.dtype)

        def project_out(v):
            coeff = precise_matmul(q.conj().T, v)
            return v - jnp.matmul(q, coeff * mask[:, None], precision=_HI)

        resid = project_out(project_out(x_new))
        ratio = jnp.linalg.norm(resid, axis=0) / jnp.maximum(
            jnp.linalg.norm(x_new, axis=0), 1e-300
        )
        independent = jnp.max(ratio) > config.dependency_tolerance
        q2, ncols2 = orthonormalize_append_cgs2(q, ncols, x_new)
        return q2, ncols2, independent

    res_limit = max(snapshot_tol * 100, 1e-8)

    @jax.jit
    def snapshot_shifted(op, t):
        # escalation path: near-resonance points where cond(A)·eps_f32 > 1
        # make the unshifted f32 factorization's refinement stagnate; the
        # σ-shifted factorization's condition is bounded by ~1/σ, so it is
        # f32-safe, and outer f64 GMRES restores full accuracy
        from morfem_tpu.ops.block_tridiag import shifted_gmres_solve

        c, cb = coeff_at(t)
        rhs = cb * b
        x, relres = shifted_gmres_solve(
            op, c, rhs, tol=snapshot_tol, maxiter=60
        )
        return x, relres

    # two-tier acceptance: a snapshot is a BASIS vector, so span quality —
    # not solver precision — is what matters. Residuals past res_limit but
    # within accept_limit (near-resonance points whose conditioning
    # exceeds even the shifted escalation's budget) are accepted with a
    # warning: the estimator keeps measuring TRUE residuals and the
    # dependency guard protects rank, so a mildly-inaccurate snapshot can
    # only slow convergence, never silently corrupt the result. Only
    # genuinely failed solves stop the expansion.
    accept_limit = 1e-4

    def solve_checked(t):
        x, relres = snapshot(op, t)
        worst = float(jnp.max(relres))
        # NaN (Krylov breakdown) must escalate: NaN > x is False
        if not (worst <= res_limit) and hasattr(op, "bands_w"):
            x, relres = snapshot_shifted(op, t)
            worst = float(jnp.max(relres))
        if not (worst <= accept_limit):
            warnings.warn(
                f"greedy snapshot solve at t={float(t):.6g} reached only "
                f"{worst:.1e} relative residual — stopping basis expansion "
                "(strongly indefinite operator? see ops/sparse.py CAVEAT)",
                stacklevel=3,
            )
            return x, False
        if not (worst <= res_limit):
            warnings.warn(
                f"greedy snapshot at t={float(t):.6g} accepted at "
                f"{worst:.1e} relative residual (> {res_limit:.0e}; "
                "near-resonance conditioning) — basis span is still "
                "useful; the error estimator tracks true residuals",
                stacklevel=3,
            )
        return x, True

    # Host-driven loop discipline: EVERY device computation below runs
    # under jit. Eager jnp code here would work numerically, but each of
    # its small ops is a separate XLA program, and on the axon remote-
    # compile path each program pays seconds of compile-service latency —
    # an eager orthonormalize_svd of the seeds alone (ozaki splits inside
    # cholesky_qr_refine) measured MINUTES at N≈9.4k before the first
    # greedy iteration started. This, not runtime, was what made the
    # large-N banded bench extra unboundable in rounds 3/4.
    @jax.jit
    def init_seed_basis(x0, x1):
        seeds = jnp.concatenate([x0, x1], axis=1).astype(dtype)
        q = jnp.zeros((n, k), dtype)
        return q.at[:, : 2 * m].set(orthonormalize_svd(seeds))

    @jax.jit
    def reduced_from(q, ncols, u):
        return _reduced_from_u_matfree(domain, q, ncols, u, b, coeffs)

    # seeds: snapshots at the domain ends (implementation.py:222-226)
    x0, ok0 = solve_checked(domain[0])
    x1, ok1 = solve_checked(domain[-1])
    q = init_seed_basis(x0, x1)
    ncols = jnp.asarray(2 * m)

    err_hist = np.zeros((max_iters + 1, i_pts), jnp.zeros((), rdtype).dtype)
    converged = False
    healthy = ok0 and ok1
    it = 0
    u = None
    u_ncols = None  # basis width u was computed for (staleness guard)
    while it <= max_iters:
        err, u = estimate(op, q, ncols)
        u_ncols = int(ncols)
        err_host = np.asarray(err)
        err_hist[it] = err_host
        it += 1
        if not healthy:
            break
        if float(err_host.max()) < config.error_threshold:
            converged = True
            break
        if int(ncols) + m > k:
            break
        x_new, ok = solve_checked(domain[int(err_host.argmax())])
        if not ok:
            healthy = False
            break
        q2, ncols2, independent = append(q, ncols, x_new.astype(dtype))
        if not bool(independent):
            # dependent snapshot — the estimator floor is reached; keep
            # the basis as-is (mirrors mor/greedy.py's stagnation guard)
            break
        q, ncols = q2, ncols2

    if u_ncols != int(ncols):
        # the loop exited right after an append (iteration budget spent):
        # u = A_p·Q was computed for the PRE-append basis, so building the
        # reduced model from it would leave exact-zero columns for the
        # last snapshot's block — recompute for the final basis
        _, u = estimate(op, q, ncols)

    result = GreedyResult(
        q=q,
        ncols=ncols,
        iterations=jnp.asarray(it),
        converged=jnp.asarray(converged),
        err_hist=jnp.asarray(err_hist),
        failed_snapshot=not healthy,
    )
    rm = reduced_from(q, ncols, u).trim()
    return result, rm
