"""Tests for the blocked MXU Gauss-Jordan inverse and the GJ solve path.

The factorization backend that replaces XLA's LuDecomposition on TPU
(ops/blocked_inverse.py); reference counterpart: solve_fem_point's
splu/lu_factor (implementation.py:468-480). Tests run in f32 on the CPU
backend — on CPU `matmul_f32_accurate` is a native f32 matmul, so these
validate the algorithm itself; the bf16-split GEMM engine is covered by
TestSplitMatmul, and on-chip parity is asserted in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import MorfemConfig
from morfem_tpu.ops.blocked_inverse import gj_inverse_f32
from morfem_tpu.ops.precision import matmul_f32_accurate, split_bf16
from morfem_tpu.ops.solve import gj_solve_refined, solve_dense, lu_solve_refined


def _well_conditioned(rng, n, shift=3.0):
    a = rng.normal(size=(n, n)).astype(np.float32)
    return a + np.eye(n, dtype=np.float32) * shift


class TestGjInverse:
    @pytest.mark.parametrize(
        "n,panel,sub",
        [(8, 4, 2), (37, 16, 4), (100, 32, 8), (300, 64, 8), (513, 256, 8)],
    )
    def test_matches_numpy_inverse(self, rng, n, panel, sub):
        a = _well_conditioned(rng, n)
        ainv = np.asarray(gj_inverse_f32(jnp.asarray(a), panel=panel, sub=sub))
        ref = np.linalg.inv(a.astype(np.float64))
        rel = np.linalg.norm(ainv - ref) / np.linalg.norm(ref)
        # f32 factorization: expect ~cond·ε_f32
        cond = np.linalg.cond(a.astype(np.float64))
        assert rel < 50 * cond * np.finfo(np.float32).eps, (rel, cond)

    def test_residual_matches_f32_lu_quality(self, rng):
        """The GJ inverse must be an f32-LU-grade preconditioner: the
        refinement contraction rate depends on it (ops/solve.py)."""
        import scipy.linalg as spl

        n = 200
        a = _well_conditioned(rng, n)
        ainv = np.asarray(gj_inverse_f32(jnp.asarray(a)))
        res_gj = np.linalg.norm(ainv @ a - np.eye(n))
        lu, piv = spl.lu_factor(a)
        xlu = spl.lu_solve((lu, piv), np.eye(n, dtype=np.float32))
        res_lu = np.linalg.norm(xlu @ a - np.eye(n))
        assert res_gj < 30 * max(res_lu, 1e-6), (res_gj, res_lu)

    def test_batched(self, rng):
        a = np.stack([_well_conditioned(rng, 50) for _ in range(3)])
        ai = np.asarray(gj_inverse_f32(jnp.asarray(a), panel=16, sub=4))
        for i in range(3):
            res = np.linalg.norm(ai[i] @ a[i] - np.eye(50))
            assert res < 1e-3, res

    def test_needs_pivoting(self, rng):
        """Zero leading diagonal entry — unpivoted elimination would die."""
        n = 24
        a = _well_conditioned(rng, n)
        a[0, 0] = 0.0
        ai = np.asarray(gj_inverse_f32(jnp.asarray(a), panel=8, sub=4))
        assert np.isfinite(ai).all()
        assert np.linalg.norm(ai @ a - np.eye(n)) < 1e-3

    def test_rejects_non_square(self):
        with pytest.raises(ValueError, match="square"):
            gj_inverse_f32(jnp.zeros((4, 5)))

    def test_vmap_and_jit_compose(self, rng):
        a = np.stack([_well_conditioned(rng, 40) for _ in range(2)])
        out = jax.jit(jax.vmap(lambda x: gj_inverse_f32(x, panel=16, sub=4)))(
            jnp.asarray(a)
        )
        assert np.isfinite(np.asarray(out)).all()


class TestGjSolve:
    def test_refined_solve_reaches_f64(self, rng):
        n, m = 150, 2
        a = _well_conditioned(rng, n).astype(np.float64)
        b = rng.normal(size=(n, m))
        x = np.asarray(
            gj_solve_refined(jnp.asarray(a), jnp.asarray(b), refine_iterations=10)
        )
        res = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        assert res < 1e-13, res

    def test_complex_rhs_split(self, rng):
        n, m = 80, 2
        a = _well_conditioned(rng, n).astype(np.float64)
        b = rng.normal(size=(n, m)) + 1j * rng.normal(size=(n, m))
        x = np.asarray(
            gj_solve_refined(jnp.asarray(a), jnp.asarray(b), refine_iterations=10)
        )
        res = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        assert res < 1e-13, res

    def test_rejects_complex_operator(self, rng):
        a = jnp.eye(8, dtype=jnp.complex128)
        b = jnp.ones((8, 1), jnp.complex128)
        with pytest.raises(ValueError, match="real operators"):
            gj_solve_refined(a, b)

    def test_ill_conditioned_with_refinement(self, rng):
        """Moderately ill-conditioned (cond ~1e6): refinement must still
        contract to f64 working precision — the property that lets the GJ
        backend replace LU in the full-order sweep."""
        n = 200
        q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        s = np.logspace(0, -6, n)
        a = (q * s) @ q.T
        b = rng.normal(size=(n, 2))
        x = np.asarray(
            gj_solve_refined(jnp.asarray(a), jnp.asarray(b), refine_iterations=30)
        )
        res = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        assert res < 1e-10, res

    def test_solve_dense_dispatch(self, rng):
        n = 64
        a = _well_conditioned(rng, n).astype(np.float64)
        b = rng.normal(size=(n, 2))
        cfg_gj = MorfemConfig(factorization="gj", refine_iterations=10)
        cfg_lu = MorfemConfig(factorization="lu", refine_iterations=10)
        x_gj = np.asarray(solve_dense(jnp.asarray(a), jnp.asarray(b), cfg_gj))
        x_lu = np.asarray(solve_dense(jnp.asarray(a), jnp.asarray(b), cfg_lu))
        np.testing.assert_allclose(x_gj, x_lu, rtol=1e-10, atol=1e-12)

    def test_morfem_end_to_end_gj(self, rng):
        """Full pipeline with the GJ backend matches the LU backend."""
        from morfem_tpu import morfem

        n, m = 96, 2
        a0 = _well_conditioned(rng, n, shift=float(n)).astype(np.float64) / n
        a0 = (a0 + a0.T) / 2 + np.eye(n)
        a1 = np.zeros((n, n))
        a2 = (lambda x: (x + x.T) / 2)(rng.normal(size=(n, n)) / n)
        b = rng.normal(size=(n, m))
        domain = np.linspace(1.0, 2.0, 16)
        kw = dict(error_threshold=1e-12, refine_iterations=20, sweep_method="lu")
        x_gj, q_gj, *_ = morfem(
            domain, a0, a1, a2, b,
            config=MorfemConfig(factorization="gj", **kw),
        )
        x_lu, q_lu, *_ = morfem(
            domain, a0, a1, a2, b,
            config=MorfemConfig(factorization="lu", **kw),
        )
        rec_gj = np.einsum("nk,ikm->inm", np.asarray(q_gj), np.asarray(x_gj))
        rec_lu = np.einsum("nk,ikm->inm", np.asarray(q_lu), np.asarray(x_lu))
        rel = np.linalg.norm(rec_gj - rec_lu) / np.linalg.norm(rec_lu)
        assert rel < 1e-10, rel


class TestSplitMatmul:
    def test_split_is_exact(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
        parts = split_bf16(x, pieces=3)
        recon = sum(p.astype(jnp.float32) for p in parts)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x), rtol=0, atol=0)

    def test_matmul_f32_grade(self, rng):
        """The bf16 6-product scheme must deliver ~f32-native accuracy
        (exercised explicitly — on CPU the public entry passes through)."""
        x = rng.normal(size=(128, 128)).astype(np.float32)
        y = rng.normal(size=(128, 128)).astype(np.float32)
        xs = split_bf16(jnp.asarray(x), 3)
        ys = split_bf16(jnp.asarray(y), 3)
        out = None
        for s in range(2, -1, -1):
            for i in range(s + 1):
                t = jnp.matmul(
                    xs[i], ys[s - i], preferred_element_type=jnp.float32
                )
                out = t if out is None else out + t
        ref = x.astype(np.float64) @ y.astype(np.float64)
        rel = np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref)
        assert rel < 5e-7, rel
