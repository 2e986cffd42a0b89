"""Krylov solvers as plain `lax.while_loop`s.

``jax.scipy.sparse.linalg`` wraps its solvers in `lax.custom_linear_solve`,
which eagerly builds a TRANSPOSE of the matvec — impossible when the matvec
is a Pallas kernel (no transpose rule). Additionally, vmapping a Pallas
matvec over right-hand-side columns makes XLA materialize batched copies of
the operator in VMEM. This BiCGStab therefore works on the [N, M] block
directly: ONE matvec per iteration serves all M columns, with per-column
scalars; columns that have converged simply stop changing (their updates
multiply by ~0) until all meet the tolerance.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_HI = jax.lax.Precision.HIGHEST  # f64 matmul at DEFAULT precision falls
# off a ~4000× software cliff on this TPU (see ops/precision.py)


def bicgstab(
    matvec: Callable,  # [N, M] -> [N, M]
    b: jax.Array,  # [N, M] (or [N] — promoted)
    precond: Callable = lambda x: x,
    tol: float = 1e-10,
    maxiter: int = 2000,
) -> Tuple[jax.Array, jax.Array]:
    """Block preconditioned BiCGStab; returns (x [N, M], relres [M])."""
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    b_norm = jnp.linalg.norm(b, axis=0)  # [M]
    atol = tol * b_norm
    eps = jnp.asarray(1e-300, jnp.zeros((), b.dtype).real.dtype)

    def col_dot(u, v):  # per-column ⟨u, v⟩ → [M]
        return jnp.sum(u.conj() * v, axis=0)

    x0 = jnp.zeros_like(b)
    r0 = b
    rhat = r0

    def cond(state):
        x, r, p, v, rho, alpha, omega, k = state
        unconverged = jnp.any(jnp.linalg.norm(r, axis=0) > atol)
        return jnp.logical_and(
            unconverged,
            jnp.logical_and(k < maxiter, jnp.any(jnp.abs(rho) > 1e-300)),
        )

    def safe(d):
        return jnp.where(jnp.abs(d) < 1e-300, eps, d)

    def body(state):
        x, r, p, v, rho, alpha, omega, k = state
        rho_new = col_dot(rhat, r)
        beta = (rho_new / safe(rho)) * (alpha / safe(omega))
        p = r + beta[None, :] * (p - omega[None, :] * v)
        phat = precond(p)
        v = matvec(phat)
        alpha = rho_new / safe(col_dot(rhat, v))
        s = r - alpha[None, :] * v
        shat = precond(s)
        t = matvec(shat)
        omega = col_dot(t, s) / safe(col_dot(t, t))
        x = x + alpha[None, :] * phat + omega[None, :] * shat
        r = s - omega[None, :] * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    ones = jnp.ones((b.shape[1],), b.dtype)
    init = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), ones, ones, ones,
            jnp.asarray(0))
    x, r, *_ = lax.while_loop(cond, body, init)
    relres = jnp.linalg.norm(r, axis=0) / jnp.maximum(b_norm, 1e-300)
    if squeeze:
        return x[:, 0], relres[0]
    return x, relres


def gmres(
    matvec: Callable,  # [N, 1] -> [N, 1] (applied column-wise)
    b: jax.Array,  # [N, M] or [N]
    precond: Callable = lambda x: x,
    tol: float = 1e-10,
    maxiter: int = 50,
    restart: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Restarted, right-preconditioned GMRES(m) — plain lax loops.

    Columns are solved sequentially via `lax.map` (never vmap — that would
    batch a Pallas operator's buffers into VMEM). `maxiter` counts OUTER
    restarts; each runs `restart` full Arnoldi steps (static shapes).
    Returns (x, relres per column).
    """
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    n, m_cols = b.shape
    work = b.dtype
    eps = jnp.asarray(1e-300, jnp.zeros((), work).real.dtype)

    def mv_col(x_col):
        return matvec(x_col[:, None])[:, 0]

    def solve_col(b_col):
        b_norm = jnp.linalg.norm(b_col)
        atol = tol * b_norm

        def arnoldi_cycle(x):
            r = b_col - mv_col(x)
            beta = jnp.linalg.norm(r)
            v0 = r / jnp.maximum(beta, eps)
            v = jnp.zeros((n, restart + 1), work).at[:, 0].set(v0)
            h = jnp.zeros((restart + 1, restart), work)

            def step(j, carry):
                v, h = carry
                w = mv_col(precond(v[:, j]))
                # modified Gram-Schmidt against all columns (masked ≤ j)
                mask = (jnp.arange(restart + 1) <= j).astype(work)
                coeffs = jnp.matmul(v.conj().T, w, precision=_HI) * mask
                w = w - jnp.matmul(v, coeffs, precision=_HI)
                # light re-orthogonalization pass
                coeffs2 = jnp.matmul(v.conj().T, w, precision=_HI) * mask
                w = w - jnp.matmul(v, coeffs2, precision=_HI)
                hj = coeffs + coeffs2
                wn = jnp.linalg.norm(w)
                h = h.at[:, j].set(hj)
                h = h.at[j + 1, j].set(wn)
                v = v.at[:, j + 1].set(w / jnp.maximum(wn, eps))
                return (v, h)

            v, h = jax.lax.fori_loop(0, restart, step, (v, h))
            e1 = jnp.zeros((restart + 1,), work).at[0].set(beta)
            y = jnp.linalg.lstsq(h, e1)[0]
            return x + precond(jnp.matmul(v[:, :restart], y, precision=_HI))

        def cond(state):
            x, k = state
            r = jnp.linalg.norm(b_col - mv_col(x))
            return jnp.logical_and(r > atol, k < maxiter)

        def body(state):
            x, k = state
            return (arnoldi_cycle(x), k + 1)

        x, _ = lax.while_loop(cond, body, (jnp.zeros_like(b_col),
                                           jnp.asarray(0)))
        relres = jnp.linalg.norm(b_col - mv_col(x)) / jnp.maximum(
            b_norm, 1e-300
        )
        return x, relres

    xs, rels = lax.map(solve_col, jnp.moveaxis(b, 1, 0))
    x = jnp.moveaxis(xs, 0, 1)
    if squeeze:
        return x[:, 0], rels[0]
    return x, rels
