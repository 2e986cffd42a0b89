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
