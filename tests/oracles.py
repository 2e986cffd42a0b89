"""NumPy/SciPy oracle implementations used to validate the TPU paths.

Small, direct NumPy transcriptions of the *mathematical definitions* (not
the reference code): per-point dense solves, Galerkin projection, the
residual-norm Gram expansion. Everything here is deliberately loop-based
and simple — the library is validated against these on small systems.
"""

import numpy as np


def coeffs(t, t_a0, t_a1, t_a2, t_b):
    return (
        np.asarray(t_a0(t)),
        np.asarray(t_a1(t)),
        np.asarray(t_a2(t)),
        np.asarray(t_b(t)),
    )


def assemble(t, a0, a1, a2, t_a0, t_a1, t_a2, symmetrize=True):
    c0, c1, c2, _ = coeffs(t, t_a0, t_a1, t_a2, lambda t: t)
    a = c0 * a0 + c1 * a1 + c2 * a2
    if symmetrize:
        a = (a + a.T) / 2
    return a


def solve_point(t, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, symmetrize=True):
    a = assemble(t, a0, a1, a2, t_a0, t_a1, t_a2, symmetrize)
    return np.linalg.solve(a, np.asarray(t_b(t)) * b)


def full_sweep(domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, symmetrize=True):
    return np.stack(
        [
            solve_point(t, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, symmetrize)
            for t in domain
        ]
    )


def galerkin_project(q, a0, a1, a2, b):
    qh = q.conj().T
    return qh @ a0 @ q, qh @ a1 @ q, qh @ a2 @ q, qh @ b


def residual_gram_norm(
    domain, q, x_r, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b
):
    """‖RᴴR‖_F per point where R = A_raw(t)·Q·x_r(t) − t_b(t)·B.

    A_raw is the UNsymmetrized combination — matching the estimator's
    definition (the estimator Gram blocks are built from the raw operators).
    """
    out = np.empty(len(domain))
    for i, t in enumerate(domain):
        c0, c1, c2, cb = coeffs(t, t_a0, t_a1, t_a2, t_b)
        a = c0 * a0 + c1 * a1 + c2 * a2
        r = a @ q @ x_r[i] - cb * b
        out[i] = np.linalg.norm(r.conj().T @ r)
    return out


def default_wave_coeffs():
    return (lambda t: 1.0, lambda t: t, lambda t: t**2, lambda t: t)
