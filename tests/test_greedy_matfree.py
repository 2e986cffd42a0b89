"""Tests for the matrix-free greedy (mor/greedy_matfree.py).

The reference's DEFAULT strategy (implementation.py:175, :217-318) at
large N: greedy over SpMM/banded operator applications with Krylov
snapshot solves. Validated against the dense pipeline on systems small
enough to run both.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu import MorfemConfig, greedy_basis_matfree
from morfem_tpu.mor.reduced import sweep
from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator
from morfem_tpu.ops.solve import solve_sweep
from morfem_tpu.ops.sparse import SparseAffineOperator
from morfem_tpu.system import AffineSystem

CFG = MorfemConfig(
    factor_dtype_name="float64",
    refine_iterations=0,
    error_threshold=1e-9,
    orthonormalization="mgs",
)


def _banded_system(n=240, m=2, half=6, seed=0):
    """Diagonally dominant banded affine system (Krylov-friendly)."""
    rng = np.random.default_rng(seed)

    def band(scale, shift):
        diags = [
            rng.normal(size=n - abs(d)) * scale / (1 + abs(d))
            for d in range(-half, half + 1)
        ]
        a = sp.diags(diags, offsets=range(-half, half + 1)).toarray()
        a = (a + a.T) / 2
        return a + np.eye(n) * shift

    a0 = band(1.0, 12.0)
    a1 = np.zeros((n, n))
    a2 = band(0.3, 0.0)
    b = rng.normal(size=(n, m))
    domain = np.linspace(1.0, 2.0, 24)
    return domain, a0, a1, a2, b


class TestGreedyMatfree:
    def test_converges_and_matches_full_order(self):
        domain, a0, a1, a2, b = _banded_system()
        op = SparseAffineOperator(
            sp.csr_matrix(a0), sp.csr_matrix(a1), sp.csr_matrix(a2),
            symmetrize=CFG.symmetrize,
        )
        res, rm = greedy_basis_matfree(
            op, b, domain, config=CFG, snapshot_tol=1e-12
        )
        assert bool(res.converged), np.asarray(res.err_hist).max(axis=1)
        x_r = sweep(rm, CFG)
        rec = np.einsum("nk,ikm->inm", np.asarray(rm.q), np.asarray(x_r))
        sys_ = AffineSystem.create(domain, a0, a1, a2, b)
        ref = np.asarray(solve_sweep(sys_, CFG))
        rel = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
        assert rel < 1e-7, rel

    def test_matches_dense_greedy_selection(self):
        """Same estimator → the matrix-free greedy must reach a similar
        basis size and the same convergence as the dense greedy."""
        from morfem_tpu import greedy_basis

        domain, a0, a1, a2, b = _banded_system(seed=3)
        op = SparseAffineOperator(
            sp.csr_matrix(a0), sp.csr_matrix(a1), sp.csr_matrix(a2),
            symmetrize=CFG.symmetrize,
        )
        res_mf, _ = greedy_basis_matfree(
            op, b, domain, config=CFG, snapshot_tol=1e-12
        )
        sys_ = AffineSystem.create(domain, a0, a1, a2, b)
        res_d = greedy_basis(sys_, CFG)
        assert bool(res_mf.converged) and bool(res_d.converged)
        assert abs(int(res_mf.ncols) - int(res_d.ncols)) <= 2 * b.shape[1]

    def test_banded_operator_path(self):
        domain, a0, a1, a2, b = _banded_system(seed=5)
        op = BandedAffineOperator(a0, a1, a2, symmetrize=CFG.symmetrize)
        res, rm = greedy_basis_matfree(
            op, b, domain, config=CFG, snapshot_tol=1e-12
        )
        assert bool(res.converged)
        x_r = sweep(rm, CFG)
        rec = np.einsum("nk,ikm->inm", np.asarray(rm.q), np.asarray(x_r))
        sys_ = AffineSystem.create(domain, a0, a1, a2, b)
        ref = np.asarray(solve_sweep(sys_, CFG))
        rel = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
        # the banded kernel path is f32 inside (refined); slightly looser
        assert rel < 1e-6, rel

    def test_error_history_monotone_improvement(self):
        domain, a0, a1, a2, b = _banded_system(seed=7)
        op = SparseAffineOperator(
            sp.csr_matrix(a0), sp.csr_matrix(a1), sp.csr_matrix(a2),
            symmetrize=CFG.symmetrize,
        )
        res, _ = greedy_basis_matfree(
            op, b, domain, config=CFG, snapshot_tol=1e-12
        )
        hist = np.asarray(res.err_hist)[: int(res.iterations)].max(axis=1)
        assert hist[-1] < hist[0] * 1e-2, hist

    def test_failed_snapshot_stops_cleanly(self):
        """A hopeless Krylov budget must warn and return converged=False
        without poisoning the basis."""
        domain, a0, a1, a2, b = _banded_system(seed=9)
        op = SparseAffineOperator(
            sp.csr_matrix(a0), sp.csr_matrix(a1), sp.csr_matrix(a2),
            symmetrize=CFG.symmetrize,
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            res, rm = greedy_basis_matfree(
                op, b, domain, config=CFG,
                snapshot_tol=1e-12, snapshot_maxiter=1,
            )
        assert not bool(res.converged)
        assert any("relative residual" in str(x.message) for x in w)
        assert np.isfinite(np.asarray(res.q)).all()


class TestMorfemMatfreeRouting:
    """morfem() keeps SciPy-sparse inputs matrix-free past dense_cutoff
    (the reference's always-sparse splu behaviour) — same call contract,
    q returned in the caller's row ordering despite internal RCM."""

    def _system(self, n=1024):
        import scipy.sparse as sp

        from morfem_tpu.apps.waveguide import GAMMA_SCALE
        from morfem_tpu.utils.synthetic import banded_waveguide_system

        c, t, wp = banded_waveguide_system(
            n, m=2, half=5, seed=7, length_m=1.0
        )
        gamma = (t * GAMMA_SCALE).tocsr()
        rng = np.random.default_rng(3)
        scram = rng.permutation(n)
        cs = c.tocsr()[scram][:, scram]
        gs = gamma.tocsr()[scram][:, scram]
        wps = np.asarray(wp)[scram]
        zero = sp.csr_matrix((n, n))
        domain = np.linspace(3e9, 5e9, 24)
        return domain, cs, zero, gs, wps

    def _check(self, domain, cs, gs, wps, x, q, pts, tol):
        cd = cs.toarray()
        gd = gs.toarray()
        worst = 0.0
        for i in pts:
            f = domain[i]
            a_f = cd + gd * f * f
            a_f = (a_f + a_f.T) / 2
            ref = np.linalg.solve(a_f, wps * f)
            rec = np.asarray(q @ np.asarray(x[i]))
            worst = max(
                worst, np.linalg.norm(rec - ref) / np.linalg.norm(ref)
            )
        assert worst < tol, worst

    def test_greedy_matfree_route(self):
        import morfem_tpu as mt
        from morfem_tpu.config import MorfemConfig

        domain, cs, zero, gs, wps = self._system()
        cfg = MorfemConfig(
            error_threshold=1e3, max_greedy_iterations=40, dense_cutoff=512
        )
        x, q, r0, r1, r2, b_r = mt.morfem(
            domain, cs, zero, gs, wps, config=cfg
        )
        assert q.shape[0] == 1024 and x.shape[0] == 24
        assert r0.shape == (q.shape[1], q.shape[1])
        self._check(domain, cs, gs, wps, x, q, (0, 12, 23), 1e-7)

    def test_equally_matfree_route(self):
        import morfem_tpu as mt
        from morfem_tpu.config import MorfemConfig

        domain, cs, zero, gs, wps = self._system()
        cfg = MorfemConfig(
            use_equally_distributed=True,
            equally_distributed_reduction_rate=0.5,
            dense_cutoff=512,
        )
        x, q, *_ = mt.morfem(domain, cs, zero, gs, wps, config=cfg)
        self._check(domain, cs, gs, wps, x, q, (0, 23), 1e-6)


def test_greedy_matfree_singular_point_fails_gracefully():
    """A domain point sitting exactly ON a resonance makes A(t) singular —
    no solver can fix that. The greedy must warn and stop with
    converged=False instead of crashing or silently producing garbage."""
    import warnings

    import scipy.sparse as sp

    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
    from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator

    n = 512
    # pencil (C, I): resonances at C's eigenvalues; put a domain point
    # exactly on one
    rng = np.random.default_rng(0)
    main = np.full(n, 2.0)
    off = np.full(n - 1, -1.0)
    c = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    evals = np.linalg.eigvalsh(c.toarray())
    lam_mid = evals[n // 2]
    t_sing = np.sqrt(lam_mid)  # with t_a2 = t², a2 = -I: A(t) = C - t²·I
    op = BandedAffineOperator(
        c, sp.csr_matrix((n, n)), -sp.eye(n).tocsr(), symmetrize=True
    )
    b = jnp.asarray(rng.normal(size=(n, 2)))
    domain = jnp.asarray(
        np.concatenate([[0.1], [t_sing], [np.sqrt(evals[-1]) * 2]])
    )
    config = MorfemConfig(error_threshold=1e-20, max_greedy_iterations=6)
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        result, rm = greedy_basis_matfree(op, b, domain, config=config)
    # must terminate (no exception), flag non-convergence, and warn
    assert not bool(result.converged)
    assert any("residual" in str(w.message) for w in ws)
    assert np.isfinite(np.asarray(rm.r0)).all()


def test_greedy_matfree_budget_exhausted_reduced_model_not_stale():
    """When the iteration budget is exhausted right after an append, the
    returned ReducedModel must be built for the FINAL basis — a stale
    U = A_p·Q_old would leave exact-zero columns in r0/r2 (singular
    reduced operators) for the last snapshot's block."""
    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
    from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator
    from morfem_tpu.utils.synthetic import banded_waveguide_system

    n = 768
    c, t, wp = banded_waveguide_system(n, m=2, half=4, seed=9, length_m=1.0)
    gamma = (t * GAMMA_SCALE).tocsr()
    op = BandedAffineOperator(c, 0.0 * c, gamma, symmetrize=True)
    b = jnp.asarray(wp)
    domain = jnp.linspace(3e9, 5e9, 16, dtype=jnp.float64)
    # unreachable threshold + tiny budget → exits via `while it <= max`
    # immediately after an append
    config = MorfemConfig(error_threshold=1e-30, max_greedy_iterations=2)
    result, rm = greedy_basis_matfree(op, b, domain, config=config)
    assert not bool(result.converged)
    nc = int(rm.ncols)
    assert rm.q.shape[1] == nc  # trimmed
    # every active column of the reduced operators must be nonzero
    for name in ("r0", "r2"):
        col_norms = np.linalg.norm(np.asarray(getattr(rm, name)), axis=0)
        assert (col_norms > 0).all(), f"{name} has zero columns: {col_norms}"
    # and the reduced sweep must produce finite solutions
    from morfem_tpu.mor.reduced import sweep

    x = sweep(rm)
    assert np.isfinite(np.asarray(x)).all()
