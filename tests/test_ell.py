"""ELL (gather-only) operator tests — packing, applies, router wiring.

Oracle: dense matmul of the same SciPy matrices. ELL is pure XLA
(gathers + FMAs — see ops/ell.py on why there is no Pallas kernel), so
the CPU tests exercise the exact on-chip program shape.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import morfem_tpu.ops.ell as ell_mod
from morfem_tpu.ops.ell import ELLAffineOperator, ell_from_scipy, ell_matmul


def _scattered_pencil(n=350, seed=0, nfar=80):
    """Diagonal + weak scattered symmetric couplings: the pattern BSR
    blocks WORST (isolated entries → one 32×128 dense block each) while
    ELL pads best (bounded row degree)."""
    rng = np.random.default_rng(seed)
    mats = []
    for p in range(3):
        far = sp.coo_matrix(
            (
                0.05 * rng.standard_normal(nfar),
                (rng.integers(0, n, nfar), rng.integers(0, n, nfar)),
            ),
            shape=(n, n),
        )
        m = sp.diags(4.0 + rng.random(n)) + far + far.T
        mats.append(m.tocsr())
    return mats, rng


class TestEllPacking:
    def test_pack_roundtrip_per_addend(self):
        mats, rng = _scattered_pencil()
        n = mats[0].shape[0]
        vals, cols = ell_from_scipy(mats, n)
        x = rng.standard_normal((n, 3))
        for p in range(3):
            y = ell_matmul(jnp.asarray(vals[p]), jnp.asarray(cols), jnp.asarray(x))
            ref = mats[p] @ x
            assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * np.linalg.norm(ref)

    def test_vector_rhs_and_empty_rows(self):
        rng = np.random.default_rng(1)
        n = 120
        a = sp.lil_matrix((n, n))
        for i in range(0, n, 3):  # two of every three rows empty
            a[i, rng.integers(0, n)] = rng.standard_normal()
        a = a.tocsr()
        vals, cols = ell_from_scipy([a], n)
        x = rng.standard_normal(n)
        y = ell_matmul(jnp.asarray(vals[0]), jnp.asarray(cols), jnp.asarray(x))
        ref = a @ x
        assert y.shape == (n,)
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * max(
            np.linalg.norm(ref), 1.0
        )

    def test_slot_loop_path_matches_one_shot(self, monkeypatch):
        mats, rng = _scattered_pencil(seed=2)
        n = mats[0].shape[0]
        vals, cols = ell_from_scipy(mats, n)
        x = rng.standard_normal((n, 2))
        one_shot = ell_matmul(jnp.asarray(vals[0]), jnp.asarray(cols), jnp.asarray(x))
        monkeypatch.setattr(ell_mod, "_ONE_SHOT_ELEMS", 0)
        looped = ell_matmul(jnp.asarray(vals[0]), jnp.asarray(cols), jnp.asarray(x))
        assert np.allclose(np.asarray(one_shot), np.asarray(looped))


class TestELLAffineOperator:
    def test_matvec_matches_dense_symmetrized(self):
        mats, rng = _scattered_pencil(seed=3)
        n = mats[0].shape[0]
        op = ELLAffineOperator(*mats, symmetrize=True)
        c = jnp.asarray([1.3, -0.7, 2.1])
        x = jnp.asarray(rng.standard_normal((n, 2)))
        y = op.matvec(c, x)
        dense = sum(
            float(c[p]) * ((m + m.T) * 0.5).toarray()
            for p, m in enumerate(mats)
        )
        ref = dense @ np.asarray(x)
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * np.linalg.norm(ref)
        for p in range(3):
            yp = op.apply_addend(p, x)
            refp = ((mats[p] + mats[p].T) * 0.5) @ np.asarray(x)
            assert np.linalg.norm(np.asarray(yp) - refp) <= 1e-12 * np.linalg.norm(refp)
        d = op.diagonal(c)
        assert np.allclose(np.asarray(d), np.diagonal(dense))

    def test_bind_f32_and_bind_precise(self):
        mats, rng = _scattered_pencil(seed=4)
        n = mats[0].shape[0]
        op = ELLAffineOperator(*mats, symmetrize=False)
        c = jnp.asarray([0.5, 1.0, -1.5])
        x = jnp.asarray(rng.standard_normal((n, 2)))
        ref = np.asarray(op.bind_precise(c)(x))
        y32 = op.bind(c)(x)
        assert y32.dtype == x.dtype
        assert np.linalg.norm(np.asarray(y32) - ref) <= 1e-5 * np.linalg.norm(ref)
        dense = sum(float(c[p]) * mats[p].toarray() for p in range(3))
        assert np.linalg.norm(ref - dense @ np.asarray(x)) <= 1e-12 * np.linalg.norm(ref)

    def test_rejects_complex(self):
        n = 16
        a = sp.eye(n, dtype=complex, format="csr") * (1 + 1j)
        with pytest.raises(ValueError, match="interleaved real embedding"):
            ELLAffineOperator(a, a, a)

    def test_inflation_small_for_bounded_row_degree(self):
        mats, _ = _scattered_pencil(seed=5)
        op = ELLAffineOperator(*mats)
        assert 1.0 <= op.inflation <= 8.0


class TestRouterPicksEll:
    def test_truncated_band_routes_scattered_to_ell(self):
        """Isolated far couplings: BSR inflates past its 32× threshold,
        row degree stays bounded → the router's exact operator is ELL,
        and the shifted-precond GMRES solve still reaches 1e-8."""
        from morfem_tpu.ops.block_tridiag import (
            general_sparse_solve,
            truncated_band_via_rcm,
        )

        mats, rng = _scattered_pencil(seed=6)
        n = mats[0].shape[0]
        exact, band, perm, dropped = truncated_band_via_rcm(
            mats[0], mats[1], mats[2], band_half=8
        )
        assert isinstance(exact, ELLAffineOperator), (
            type(exact).__name__,
            getattr(exact, "inflation", None),
        )
        c = jnp.asarray([1.0, 0.2, 0.4])
        rhs = jnp.asarray(rng.standard_normal((n, 2)))
        x, relres = general_sparse_solve(exact, band, c, rhs, maxiter=200)
        assert float(jnp.max(relres)) < 1e-8
        p = np.asarray(perm)
        dense = sum(
            float(c[q]) * ((m + m.T) * 0.5).toarray()
            for q, m in enumerate(mats)
        )[p][:, p]
        ref = np.linalg.solve(dense, np.asarray(rhs))
        assert np.linalg.norm(np.asarray(x) - ref) <= 1e-7 * np.linalg.norm(ref)
