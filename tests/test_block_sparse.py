"""Block-sparse (BSR) operator tests — XLA path, Pallas interpret, wiring.

Oracle: dense matmul of the same SciPy matrices. The Pallas kernel runs
in interpret mode on the CPU backend (the on-chip smoke lives in
tools/onchip_smoke.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu.ops.block_sparse import (
    BlockSparseAffineOperator,
    bsr_from_scipy,
    bsr_matmul,
    bsr_matmul_pallas,
)


def _random_sparse(n, rng, density=0.01, scatter=0.2, half=40):
    """Banded-ish sparsity plus a scattered off-band remainder."""
    rows, cols, vals = [], [], []
    nnz_band = int(n * n * density * (1 - scatter))
    r = rng.integers(0, n, nnz_band)
    c = np.clip(r + rng.integers(-half, half + 1, nnz_band), 0, n - 1)
    rows.append(r), cols.append(c)
    vals.append(rng.standard_normal(nnz_band))
    nnz_far = int(n * n * density * scatter)
    rows.append(rng.integers(0, n, nnz_far))
    cols.append(rng.integers(0, n, nnz_far))
    vals.append(rng.standard_normal(nnz_far))
    a = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    a = a + sp.eye(n) * (2.0 * half * density * n + 1.0)  # nonzero diagonal
    return a


class TestBsrMatmul:
    def test_xla_path_matches_dense(self):
        rng = np.random.default_rng(0)
        n = 300
        mats = [_random_sparse(n, rng) for _ in range(3)]
        vals, brows, bcols, nbr, nbc = bsr_from_scipy(mats, n, 32, 128)
        x = rng.standard_normal((n, 3))
        for p in range(3):
            y = bsr_matmul(
                jnp.asarray(vals[p]), jnp.asarray(brows), jnp.asarray(bcols),
                nbr, nbc, n, jnp.asarray(x),
            )
            ref = mats[p] @ x
            assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * np.linalg.norm(ref)

    def test_pallas_interpret_matches_dense(self):
        rng = np.random.default_rng(1)
        n = 260
        mats = [_random_sparse(n, rng)]
        vals, brows, bcols, nbr, nbc = bsr_from_scipy(mats, n, 32, 128)
        x = rng.standard_normal((n, 2))
        vals2d = jnp.asarray(vals[0], jnp.float32).reshape(-1, 128)
        y = bsr_matmul_pallas(
            vals2d, jnp.asarray(brows), jnp.asarray(bcols), nbr, nbc,
            n, 32, 128, jnp.asarray(x), interpret=True,
        )
        ref = mats[0] @ x
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-5 * np.linalg.norm(ref)

    def test_vector_rhs_and_empty_block_rows(self):
        rng = np.random.default_rng(2)
        n = 200
        # leave rows 64..127 entirely empty: their block rows get fillers
        a = sp.lil_matrix((n, n))
        for i in list(range(0, 64)) + list(range(128, n)):
            a[i, rng.integers(0, n)] = rng.standard_normal()
        a = a.tocsr()
        vals, brows, bcols, nbr, nbc = bsr_from_scipy([a], n, 32, 128)
        x = rng.standard_normal(n)
        y = bsr_matmul(
            jnp.asarray(vals[0]), jnp.asarray(brows), jnp.asarray(bcols),
            nbr, nbc, n, jnp.asarray(x),
        )
        ref = a @ x
        assert y.shape == (n,)
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * max(
            np.linalg.norm(ref), 1.0
        )


class TestBlockSparseAffineOperator:
    def _pencil(self, n=280, seed=3):
        rng = np.random.default_rng(seed)
        mats = [_random_sparse(n, rng) for _ in range(3)]
        return mats, rng

    def test_matvec_matches_dense_symmetrized(self):
        mats, rng = self._pencil()
        n = mats[0].shape[0]
        op = BlockSparseAffineOperator(*mats, symmetrize=True)
        c = jnp.asarray([1.3, -0.7, 2.1])
        x = jnp.asarray(rng.standard_normal((n, 2)))
        y = op.matvec(c, x)
        dense = sum(
            float(c[p]) * ((m + m.T) * 0.5).toarray() for p, m in enumerate(mats)
        )
        ref = dense @ np.asarray(x)
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-12 * np.linalg.norm(ref)
        # per-addend applies and the diagonal agree with the dense oracle
        for p in range(3):
            yp = op.apply_addend(p, x)
            refp = ((mats[p] + mats[p].T) * 0.5) @ np.asarray(x)
            assert np.linalg.norm(np.asarray(yp) - refp) <= 1e-12 * np.linalg.norm(refp)
        d = op.diagonal(c)
        assert np.allclose(np.asarray(d), np.diagonal(dense))

    def test_bind_f32_interpret(self):
        mats, rng = self._pencil(seed=4)
        n = mats[0].shape[0]
        op = BlockSparseAffineOperator(*mats, symmetrize=False)
        c = jnp.asarray([0.5, 1.0, -1.5])
        x = jnp.asarray(rng.standard_normal((n, 2)))
        y = op.bind(c)(x)
        ref = np.asarray(op.bind_precise(c)(x))
        assert np.linalg.norm(np.asarray(y) - ref) <= 1e-5 * np.linalg.norm(ref)

    def test_inflation_reported(self):
        mats, _ = self._pencil(seed=5)
        op = BlockSparseAffineOperator(*mats)
        assert op.inflation >= 1.0


class TestGeneralSparseWiring:
    def test_general_sparse_solve_with_bsr_exact(self):
        """Indefinite pencil, non-band-recoverable: BSR exact op + in-band
        shifted preconditioner reaches 1e-8 (mirrors test_general_sparse)."""
        from morfem_tpu.ops.block_tridiag import (
            general_sparse_solve,
            truncated_band_via_rcm,
        )

        from morfem_tpu.ops.block_sparse import BlockSparseAffineOperator

        rng = np.random.default_rng(6)
        n = 400
        # FEM-like band (half=20) keeps the block fill high enough that
        # the router picks the BSR exact operator...
        diags = [4.0 + 20 * 0.1 + rng.random(n)] + [
            -0.1 * np.ones(n - d) for d in range(1, 21) for _ in (0,)
        ]
        offs = [0] + [d for d in range(1, 21)]
        a0 = sp.diags(diags, offs).tocsr()
        a0 = (a0 + a0.T) * 0.5
        # ...while long-range couplings break band recovery
        far = sp.coo_matrix(
            (0.05 * rng.standard_normal(60),
             (rng.integers(0, n, 60), rng.integers(0, n, 60))),
            shape=(n, n),
        )
        a0 = (a0 + far + far.T).tocsr()
        a2 = sp.eye(n).tocsr() * -1.0  # indefinite at t² ≈ eigenvalues
        a1 = sp.csr_matrix((n, n))
        exact, band, perm, dropped = truncated_band_via_rcm(
            a0, a1, a2, band_half=8
        )
        assert isinstance(exact, BlockSparseAffineOperator), (
            type(exact).__name__,
            getattr(exact, "inflation", None),
        )
        c = jnp.asarray([1.0, 0.0, 2.5])  # A0 − 2.5·I: indefinite
        rhs = jnp.asarray(rng.standard_normal((n, 2)))
        x, relres = general_sparse_solve(exact, band, c, rhs, maxiter=200)
        assert float(jnp.max(relres)) < 1e-8
        dense = (
            np.asarray((a0 + a0.T).toarray() * 0.5) - 2.5 * np.eye(n)
        )[np.asarray(perm)][:, np.asarray(perm)]
        ref = np.linalg.solve(dense, np.asarray(rhs))
        assert np.linalg.norm(np.asarray(x) - ref) <= 1e-7 * np.linalg.norm(ref)
