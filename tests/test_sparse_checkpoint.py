"""Tests for the BCOO/iterative large-N path and checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu import AffineSystem, MorfemConfig, project, sweep
from morfem_tpu.mor.reduced import ReducedModel
from morfem_tpu.ops.sparse import (
    SparseAffineOperator,
    solve_point_iterative,
    sparse_project,
    sparse_snapshot_basis,
    to_bcoo,
)
from morfem_tpu.utils.checkpoint import load_reduced_model, save_reduced_model
from morfem_tpu.utils.synthetic import random_affine_system

CFG = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)


def make_sparse_system(n=300, density=0.02, seed=0):
    rng = np.random.default_rng(seed)
    def sym_sparse(shift):
        a = sp.random(n, n, density=density, random_state=rng, format="csr")
        a = (a + a.T) * 0.5
        return a + sp.eye(n) * shift
    a0 = sym_sparse(5.0 + 25.0)  # dominant, keeps A(t) definite-ish
    a1 = sym_sparse(0.1)
    a2 = sym_sparse(0.2)
    b = np.zeros((n, 2))
    b[rng.choice(n, 10, replace=False), 0] = 1.0
    b[rng.choice(n, 10, replace=False), 1] = 1.0
    domain = np.linspace(1.0, 2.0, 12)
    return domain, a0, a1, a2, b


class TestSparseOps:
    def test_to_bcoo_roundtrip(self):
        domain, a0, *_ , b = make_sparse_system(50)
        bc = to_bcoo(a0)
        np.testing.assert_allclose(
            np.asarray(bc.todense()), a0.toarray(), rtol=1e-14
        )

    def test_matvec_matches_dense(self):
        domain, a0, a1, a2, b = make_sparse_system(80)
        op = SparseAffineOperator(a0, a1, a2)
        c = jnp.asarray([1.0, 1.5, 2.25])
        x = jnp.asarray(np.random.default_rng(1).normal(size=(80, 2)))
        y = op.matvec(c, x)
        a_dense = 1.0 * a0.toarray() + 1.5 * a1.toarray() + 2.25 * a2.toarray()
        a_dense = (a_dense + a_dense.T) / 2
        np.testing.assert_allclose(np.asarray(y), a_dense @ np.asarray(x), rtol=1e-10)

    def test_diagonal(self):
        domain, a0, a1, a2, b = make_sparse_system(60)
        op = SparseAffineOperator(a0, a1, a2)
        c = jnp.asarray([2.0, 0.5, 1.0])
        d = op.diagonal(c)
        expected = (
            2.0 * a0.diagonal() + 0.5 * a1.diagonal() + 1.0 * a2.diagonal()
        )
        np.testing.assert_allclose(np.asarray(d), expected, rtol=1e-12)

    def test_iterative_solve_matches_direct(self):
        domain, a0, a1, a2, b = make_sparse_system(150)
        op = SparseAffineOperator(a0, a1, a2)
        t = 1.4
        c = jnp.asarray([1.0, t, t * t])
        rhs = jnp.asarray(b) * t
        x = solve_point_iterative(op, c, rhs, tol=1e-12)
        a_dense = a0.toarray() + t * a1.toarray() + t * t * a2.toarray()
        a_dense = (a_dense + a_dense.T) / 2
        x_ref = np.linalg.solve(a_dense, np.asarray(rhs))
        rel = np.linalg.norm(np.asarray(x) - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-8, rel

    def test_sparse_pipeline_end_to_end(self):
        """Sparse snapshots + sparse projection feed the dense reduced
        sweep; result must match the dense pipeline."""
        domain, a0, a1, a2, b = make_sparse_system(200)
        seed_idx = jnp.asarray([0, 5, 11])
        sys = AffineSystem.create(domain, a0, a1, a2, b)
        coeffs = (sys.t_a0, sys.t_a1, sys.t_a2, sys.t_b)
        q = sparse_snapshot_basis(
            (a0, a1, a2), jnp.asarray(b), jnp.asarray(domain), seed_idx,
            coeffs, CFG, tol=1e-12,
        )
        (r0, r1, r2), b_r = sparse_project((a0, a1, a2), b, q)
        rm = ReducedModel(
            domain=jnp.asarray(domain), q=q, r0=r0, r1=r1, r2=r2, b_r=b_r,
            ncols=jnp.asarray(q.shape[1]),
            t_a0=sys.t_a0, t_a1=sys.t_a1, t_a2=sys.t_a2, t_b=sys.t_b,
        )
        x_sparse = sweep(rm, CFG)
        # dense-pipeline oracle
        from morfem_tpu import equally_distributed_basis

        qd = equally_distributed_basis(sys, CFG, count=3)
        rmd = project(sys, qd)
        xd = sweep(rmd, CFG)
        rec_s = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x_sparse))
        rec_d = np.einsum("nk,ikm->inm", np.asarray(qd), np.asarray(xd))
        np.testing.assert_allclose(rec_s, rec_d, atol=1e-7)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        key = jax.random.PRNGKey(0)
        domain, a0, a1, a2, b = random_affine_system(key, n=40, m=2, num_points=10)
        sys = AffineSystem.create(domain, a0, a1, a2, b)
        from morfem_tpu import equally_distributed_basis

        q = equally_distributed_basis(sys, CFG, count=3)
        rm = project(sys, q)
        x_before = sweep(rm, CFG)
        path = str(tmp_path / "model.npz")
        save_reduced_model(path, rm, metadata={"note": "test"})
        rm2 = load_reduced_model(path)
        x_after = sweep(rm2, CFG)
        np.testing.assert_allclose(
            np.asarray(x_after), np.asarray(x_before), rtol=1e-14
        )
        np.testing.assert_allclose(np.asarray(rm2.q), np.asarray(rm.q))

    def test_roundtrip_without_extension(self, tmp_path):
        """save('model') / load('model') must round-trip even though
        np.savez appends '.npz' to the written file (ADVICE r1)."""
        key = jax.random.PRNGKey(2)
        domain, a0, a1, a2, b = random_affine_system(key, n=24, m=1, num_points=6)
        sys = AffineSystem.create(domain, a0, a1, a2, b)
        from morfem_tpu import equally_distributed_basis

        q = equally_distributed_basis(sys, CFG, count=2)
        rm = project(sys, q)
        path = str(tmp_path / "model")  # no .npz
        save_reduced_model(path, rm)
        rm2 = load_reduced_model(path)
        np.testing.assert_allclose(np.asarray(rm2.q), np.asarray(rm.q))

    def test_wrong_coefficient_reload_warns(self, tmp_path):
        """Reloading with a different t_b (the serve.py forgotten-kte
        mistake, VERDICT r2 #7) must warn loudly, not sweep wrong."""
        key = jax.random.PRNGKey(4)
        domain, a0, a1, a2, b = random_affine_system(key, n=24, m=1, num_points=6)
        sys = AffineSystem.create(domain, a0, a1, a2, b)
        from morfem_tpu import equally_distributed_basis

        q = equally_distributed_basis(sys, CFG, count=2)
        rm = project(sys, q)
        path = str(tmp_path / "model.npz")
        save_reduced_model(path, rm)
        with pytest.warns(UserWarning, match="t_b"):
            load_reduced_model(path, t_b=lambda t: 2.0 * t)
        # matching callables: silent
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            load_reduced_model(path)
        # opt-out path stays silent too
        with _w.catch_warnings():
            _w.simplefilter("error")
            load_reduced_model(
                path, t_b=lambda t: 2.0 * t, check_coefficients=False
            )

    def test_version_check(self, tmp_path):
        import json

        path = str(tmp_path / "bad.npz")
        np.savez(
            path, domain=np.zeros(2), q=np.zeros((2, 1)), r0=np.zeros((1, 1)),
            r1=np.zeros((1, 1)), r2=np.zeros((1, 1)), b_r=np.zeros((1, 1)),
            ncols=np.asarray(1), meta=json.dumps({"format_version": 999}),
        )
        with pytest.raises(ValueError, match="unsupported"):
            load_reduced_model(path)
