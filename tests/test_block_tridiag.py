"""Block-tridiagonal direct solver (ops/block_tridiag) — the banded-splu
analogue. Oracle: NumPy dense solves. The headline case is the INDEFINITE
in-band Helmholtz system C − k²T that the Jacobi-Krylov path cannot solve
(ops/sparse.py CAVEAT; reference handles it via splu,
implementation.py:474-476)."""

import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu.ops.block_tridiag import (
    band_to_blocks,
    banded_direct_solve,
    block_tridiag_apply,
    block_tridiag_factor,
    shifted_gmres_solve,
)
from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator, to_banded


def _banded_sym(n, half, seed, diag_shift=0.0):
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n))
    for d in range(half + 1):
        v = rng.normal(size=n - d)
        a[np.arange(n - d), np.arange(d, n)] = v
        a[np.arange(d, n), np.arange(n - d)] = v
    a += np.eye(n) * diag_shift
    return a


def _helmholtz_pencil(n=768, half=3, seed=2):
    """1-D Helmholtz-like pencil: C (stiffness, SPD) and T (mass, SPD)."""
    c = np.zeros((n, n))
    i = np.arange(n)
    c[i, i] = 2.0
    c[i[:-1], i[:-1] + 1] = -1.0
    c[i[:-1] + 1, i[:-1]] = -1.0
    c *= (n + 1) ** 2 / 40.0  # scale so the spectrum spans a useful range
    t = np.eye(n) + 0.1 * _banded_sym(n, half, seed) / n
    t += np.eye(n) * 0.5  # keep T SPD
    return c, t


def test_band_to_blocks_roundtrip():
    n, half, b = 200, 5, 64
    a = _banded_sym(n, half, seed=0, diag_shift=4.0)
    band, h = to_banded(a)
    assert h == half
    l, d, u = band_to_blocks(jnp.asarray(band), h, b)
    nb = l.shape[0]
    n_pad = nb * b
    full = np.zeros((n_pad, n_pad))
    for i in range(nb):
        full[i * b : (i + 1) * b, i * b : (i + 1) * b] = np.asarray(d[i])
        if i > 0:
            full[i * b : (i + 1) * b, (i - 1) * b : i * b] = np.asarray(l[i])
        if i < nb - 1:
            full[i * b : (i + 1) * b, (i + 1) * b : (i + 2) * b] = np.asarray(
                u[i]
            )
    np.testing.assert_allclose(full[:n, :n], a, atol=1e-14)
    # padding rows are identity
    np.testing.assert_allclose(
        full[n:, n:], np.eye(n_pad - n), atol=1e-14
    )


def test_factor_apply_spd():
    n, half, b = 300, 4, 64
    a = _banded_sym(n, half, seed=1, diag_shift=6.0)
    band, h = to_banded(a)
    l, d, u = band_to_blocks(jnp.asarray(band), h, b)
    f = block_tridiag_factor(l, d, u, n)
    rhs = np.random.default_rng(3).normal(size=(n, 2))
    x = np.asarray(block_tridiag_apply(f, jnp.asarray(rhs)))
    ref = np.linalg.solve(a, rhs)
    # f32 factorization: relative error bounded by cond·eps_f32
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-4


def test_banded_direct_solve_refines_to_f64():
    c, t = _helmholtz_pencil()
    n = c.shape[0]
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    k2 = 0.0  # definite case first
    coef = jnp.asarray([1.0, 0.0, -k2])
    rhs = np.random.default_rng(5).normal(size=(n, 2))
    x, relres, iters = banded_direct_solve(op, coef, jnp.asarray(rhs))
    assert float(jnp.max(relres)) < 1e-12
    ref = np.linalg.solve(c - k2 * t, rhs)
    assert np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref) < 1e-10


def test_banded_direct_solve_indefinite_in_band():
    """The case the Jacobi-Krylov path stagnates on: k² inside the
    spectrum of the (C, T) pencil — A = C − k²T strongly indefinite."""
    c, t = _helmholtz_pencil()
    n = c.shape[0]
    evals = np.linalg.eigvalsh(
        np.linalg.solve(t, c)
    )  # generalized eigenvalues of (C, T)
    k2 = float((evals[n // 3] + evals[n // 3 + 1]) / 2)  # squarely in band
    a = c - k2 * t
    assert (np.linalg.eigvalsh((a + a.T) / 2) < 0).sum() > 10  # indefinite
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    coef = jnp.asarray([1.0, 0.0, -k2])
    rhs = np.random.default_rng(7).normal(size=(n, 2))
    x, relres, iters = banded_direct_solve(op, coef, jnp.asarray(rhs))
    assert float(jnp.max(relres)) < 1e-10
    ref = np.linalg.solve(a, rhs)
    assert np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref) < 1e-8


def test_shifted_gmres_indefinite():
    c, t = _helmholtz_pencil()
    n = c.shape[0]
    evals = np.linalg.eigvalsh(np.linalg.solve(t, c))
    k2 = float((evals[n // 2] + evals[n // 2 + 1]) / 2)
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    coef = jnp.asarray([1.0, 0.0, -k2])
    rhs = np.random.default_rng(9).normal(size=(n, 2))
    x, relres = shifted_gmres_solve(
        op, coef, jnp.asarray(rhs), tol=1e-10, maxiter=40
    )
    assert float(jnp.max(relres)) < 1e-10
    ref = np.linalg.solve(c - k2 * t, rhs)
    assert np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref) < 1e-8


def test_solve_point_iterative_auto_dispatches_direct():
    """method="auto" + banded operator must take the direct path — the
    indefinite system here makes Jacobi-BiCGStab stagnate, so reaching
    1e-10 is itself proof of the dispatch."""
    from morfem_tpu.ops.sparse import solve_point_iterative

    c, t = _helmholtz_pencil()
    n = c.shape[0]
    evals = np.linalg.eigvalsh(np.linalg.solve(t, c))
    k2 = float((evals[n // 3] + evals[n // 3 + 1]) / 2)
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    coef = jnp.asarray([1.0, 0.0, -k2])
    rhs = np.random.default_rng(11).normal(size=(n, 2))
    x, relres = solve_point_iterative(
        op, coef, jnp.asarray(rhs), return_residual=True
    )
    assert float(jnp.max(relres)) < 1e-10


def test_solve_point_iterative_direct_honors_maxiter():
    """method="direct" with maxiter=0 must skip refinement entirely: the
    f32-factor residual stays well above the f64-refined one (the r2
    advisory: a caller's Krylov budget used to be silently ignored)."""
    from morfem_tpu.ops.sparse import solve_point_iterative

    c, t = _helmholtz_pencil()
    n = c.shape[0]
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    coef = jnp.asarray([1.0, 0.0, -0.5])
    rhs = np.random.default_rng(13).normal(size=(n, 2))
    _, r_refined = solve_point_iterative(
        op, coef, jnp.asarray(rhs), method="direct", return_residual=True
    )
    _, r_capped = solve_point_iterative(
        op, coef, jnp.asarray(rhs), method="direct", maxiter=0,
        return_residual=True,
    )
    assert float(jnp.max(r_refined)) < 1e-12
    assert float(jnp.max(r_capped)) > 10 * float(jnp.max(r_refined))


def test_banded_waveguide_generator_claims():
    """The generator's docstring claims: C and T SPD, A(f) strongly
    indefinite at in-band frequencies."""
    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.utils.synthetic import banded_waveguide_system

    c, t, wp = banded_waveguide_system(3000, m=2, half=8, seed=3)
    assert np.linalg.eigvalsh(c.toarray()).min() > 0
    assert np.linalg.eigvalsh(t.toarray()).min() > 0
    f = 4.2e9
    a = (c + (t * GAMMA_SCALE) * (f * f)).toarray()
    neg = (np.linalg.eigvalsh(a) < 0).sum()
    assert neg > 20, f"expected strongly indefinite in band, got {neg} neg"
    assert wp.shape == (3000, 2) and np.any(wp != 0)


def test_greedy_matfree_banded_indefinite_end_to_end():
    """Greedy MOR over a banded operator whose in-band systems are
    indefinite — the flow VERDICT item 3+4 combine into: matrix-free
    greedy with direct banded snapshot solves."""
    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
    from morfem_tpu.mor.reduced import sweep
    from morfem_tpu.utils.synthetic import banded_waveguide_system

    n = 2048
    # length 1 m ⇒ ~13 resonances in the 3–5 GHz band (in-band mode count
    # ≈ L·Δk/π) — enough for genuine indefiniteness, few enough that the
    # greedy basis stays small
    c, t, wp = banded_waveguide_system(n, m=2, half=6, seed=5, length_m=1.0)
    gamma = (t * GAMMA_SCALE).tocsr()
    op = BandedAffineOperator(c, 0.0 * c, gamma, symmetrize=True)
    b = jnp.asarray(wp)
    domain = jnp.linspace(3e9, 5e9, 40, dtype=jnp.float64)
    # the estimator is the reference's ABSOLUTE squared residual
    # (implementation.py:424); ‖rhs‖ ≈ f·‖wp‖ ≈ 8e9 here, so 50 ≈ a
    # relative residual of √50/8e9 ≈ 9e-10
    config = MorfemConfig(error_threshold=50.0, max_greedy_iterations=40)
    result, rm = greedy_basis_matfree(op, b, domain, config=config)
    assert bool(result.converged)
    x_r = sweep(rm)
    # oracle: dense full-order solves at a few points
    cd = c.toarray()
    gd = gamma.toarray()
    for i in (0, 20, 39):
        f = float(domain[i])
        a_f = cd + gd * f * f
        a_f = (a_f + a_f.T) / 2
        ref = np.linalg.solve(a_f, np.asarray(wp) * f)
        rec = np.asarray(rm.q[:, : rm.r0.shape[0]] @ x_r[i])
        err = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
        assert err < 1e-7, f"point {i}: rel err {err:.2e}"


def test_rcm_general_sparse_direct_solve():
    """Arbitrary-ordering sparse pencil (the reference's splu domain):
    RCM recovers banded structure and the direct solve matches a dense
    oracle — including an indefinite in-band point."""
    import scipy.sparse as sp

    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.ops.block_tridiag import banded_via_rcm, rcm_direct_solve
    from morfem_tpu.utils.synthetic import banded_waveguide_system

    n = 1500
    c, t, wp = banded_waveguide_system(n, m=2, half=5, seed=11)
    gamma = (t * GAMMA_SCALE).tocsr()
    # scramble the ordering — what unstructured FEM assembly produces
    rng = np.random.default_rng(0)
    scram = rng.permutation(n)
    cs = c.tocsr()[scram][:, scram]
    gs = gamma.tocsr()[scram][:, scram]
    zero = sp.csr_matrix((n, n))
    op, perm = banded_via_rcm(cs, zero, gs)
    assert op.half <= 3 * 5 + 2, f"RCM bandwidth {op.half} too large"

    f = 4.2e9
    coef = jnp.asarray([1.0, 0.0, f * f])
    rhs = jnp.asarray(np.asarray(wp)[scram])
    x, relres, iters = rcm_direct_solve(cs, zero, gs, coef, rhs)
    assert float(jnp.max(relres)) < 1e-10
    a_dense = (cs + gs * (f * f)).toarray()
    a_dense = (a_dense + a_dense.T) / 2
    ref = np.linalg.solve(a_dense, np.asarray(rhs))
    assert np.linalg.norm(np.asarray(x) - ref) / np.linalg.norm(ref) < 1e-8


def test_rcm_rejects_unstructured():
    import pytest
    import scipy.sparse as sp

    from morfem_tpu.ops.block_tridiag import banded_via_rcm

    n = 400
    rng = np.random.default_rng(1)
    # dense random sparsity — no ordering makes this banded
    a = sp.random(n, n, density=0.2, random_state=1, format="csr")
    a = a + a.T + sp.eye(n)
    zero = sp.csr_matrix((n, n))
    with pytest.raises(ValueError):
        banded_via_rcm(a, zero, zero, max_half=32)


def test_cyclic_reduction_matches_scan():
    """CR factorization (log-depth batched levels) must match the
    sequential block-Thomas scan on an indefinite system."""
    from morfem_tpu.ops.block_tridiag import (
        cyclic_reduction_apply,
        cyclic_reduction_factor,
    )

    c, t = _helmholtz_pencil(n=900, half=4, seed=6)
    n = c.shape[0]
    evals = np.linalg.eigvalsh(np.linalg.solve(t, c))
    k2 = float((evals[n // 3] + evals[n // 3 + 1]) / 2)
    a = c - k2 * t
    band, h = to_banded((a + a.T) / 2)
    l, d, u = band_to_blocks(jnp.asarray(band), h, 64)
    crf = cyclic_reduction_factor(l, d, u, n)
    rhs = np.random.default_rng(13).normal(size=(n, 2))
    x = np.asarray(cyclic_reduction_apply(crf, jnp.asarray(rhs)))
    ref = np.linalg.solve((a + a.T) / 2, rhs)
    # f32 factor quality — refinement recovers the rest (see
    # banded_direct_solve(factorization="cr") path)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-3
    op = BandedAffineOperator(c, np.zeros_like(c), t, symmetrize=True)
    xr, relres, _ = banded_direct_solve(
        op, jnp.asarray([1.0, 0.0, -k2]), jnp.asarray(rhs),
        factorization="cr",
    )
    assert float(jnp.max(relres)) < 1e-10


@pytest.mark.parametrize("half,m,dtype", [
    (70, 3, jnp.float64),   # bw=141 > WIDE_BW -> blocked-GEMM path
    (70, 1, jnp.float32),
    (200, 2, jnp.float64),  # half > 128 -> block=256
])
def test_wide_band_matvec_blocked_matches_dense(rng, half, m, dtype):
    """Wide bands route the matvec through block-tridiagonal GEMMs (the
    per-diagonal unroll is a compile bomb at BW≈400, round 5); the
    blocked form must be an exact reformulation at any half/block."""
    from morfem_tpu.ops.pallas.banded_matvec import (
        WIDE_BW,
        banded_matvec_ref,
        to_banded,
    )

    n = 700
    a = np.zeros((n, n))
    for d in range(-half, half + 1):
        v = rng.standard_normal(n - abs(d)) * (0.5 ** abs(d) + 0.01)
        a += np.diag(v, k=d)
    band, h = to_banded(a)
    assert band.shape[1] > WIDE_BW
    x = rng.standard_normal((n, m)) if m > 1 else rng.standard_normal(n)
    y = banded_matvec_ref(
        jnp.asarray(band, dtype), h, jnp.asarray(x, dtype)
    )
    ref = a @ x
    tol = 1e-12 if dtype == jnp.float64 else 2e-5
    rel = np.linalg.norm(np.asarray(y, np.float64) - ref) / np.linalg.norm(ref)
    assert rel < tol, rel
