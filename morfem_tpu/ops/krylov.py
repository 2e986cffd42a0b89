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
