"""Unit tests for assembly, solvers, and orthonormalization vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import AffineSystem, MorfemConfig, lu_solve_refined
from morfem_tpu.ops.assembly import assemble_at, system_matrix
from morfem_tpu.ops.orthonormalize import (
    column_mask,
    orthonormalize_append_cgs2,
    orthonormalize_svd,
    orthonormalize_svd_masked,
)
from morfem_tpu.ops.solve import solve_batch, solve_point, solve_sweep
from morfem_tpu.utils.synthetic import random_affine_system

import oracles

CFG64 = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)
CFG_MIXED = MorfemConfig(factor_dtype_name="float32", refine_iterations=3)


@pytest.fixture(scope="module")
def small_system():
    key = jax.random.PRNGKey(7)
    domain, a0, a1, a2, b = random_affine_system(key, n=48, m=2, num_points=20)
    return tuple(np.asarray(v) for v in (domain, a0, a1, a2, b))


def make_sys(small_system, **kw):
    domain, a0, a1, a2, b = small_system
    return AffineSystem.create(domain, a0, a1, a2, b, **kw)


class TestAssembly:
    def test_system_matrix_matches_oracle(self, small_system):
        domain, a0, a1, a2, b = small_system
        sys = make_sys(small_system)
        a_batch, rhs_batch = assemble_at(sys, sys.domain)
        for i, t in enumerate(domain):
            a_ref = oracles.assemble(
                t, a0, a1, a2, lambda t: 1.0, lambda t: t, lambda t: t**2
            )
            np.testing.assert_allclose(np.asarray(a_batch[i]), a_ref, rtol=1e-14)
            np.testing.assert_allclose(
                np.asarray(rhs_batch[i]), t * b, rtol=1e-14
            )

    def test_symmetrization_flag(self, small_system):
        domain, a0, a1, a2, b = small_system
        a1_asym = a1 + np.triu(np.ones_like(a1)) * 0.1
        sys = AffineSystem.create(domain, a0, a1_asym, a2, b)
        a_sym, _ = assemble_at(sys, sys.domain[3], symmetrize=True)
        a_raw, _ = assemble_at(sys, sys.domain[3], symmetrize=False)
        np.testing.assert_allclose(
            np.asarray(a_sym), np.asarray(a_raw + a_raw.T) / 2, rtol=1e-14
        )
        assert not np.allclose(np.asarray(a_raw), np.asarray(a_raw).T)

    def test_custom_coefficients(self, small_system):
        domain, a0, a1, a2, b = small_system
        sys = AffineSystem.create(
            domain, a0, a1, a2, b, t_a1=lambda t: -(t**2), t_b=lambda t: 2 * t
        )
        c, cb = sys.coefficients(sys.domain)
        np.testing.assert_allclose(np.asarray(c[:, 1]), -(domain**2))
        np.testing.assert_allclose(np.asarray(cb), 2 * domain)

    def test_scipy_sparse_input(self, small_system):
        import scipy.sparse as sp

        domain, a0, a1, a2, b = small_system
        sys = AffineSystem.create(
            domain, sp.csc_array(a0), sp.csc_array(a1), sp.csc_array(a2),
            sp.csc_array(b),
        )
        np.testing.assert_allclose(np.asarray(sys.a0), a0)
        np.testing.assert_allclose(np.asarray(sys.b), b)

    def test_zero_matrix_form(self, small_system):
        """The documented equivalent-call form with a zero addend
        (reference docs/source/index.rst:52-62)."""
        domain, a0, a1, a2, b = small_system
        sys = AffineSystem.create(
            domain, a0, np.zeros_like(a0), a2, b, t_a2=lambda t: -(t**2)
        )
        a, _ = assemble_at(sys, sys.domain[0])
        t = domain[0]
        ref = oracles.assemble(
            t, a0, np.zeros_like(a0), a2,
            lambda t: 1.0, lambda t: t, lambda t: -(t**2),
        )
        np.testing.assert_allclose(np.asarray(a), ref, rtol=1e-14)


class TestSolvers:
    def test_lu_refined_f64(self, small_system):
        domain, a0, a1, a2, b = small_system
        a = oracles.assemble(
            domain[5], a0, a1, a2, lambda t: 1.0, lambda t: t, lambda t: t**2
        )
        x = lu_solve_refined(
            jnp.asarray(a), jnp.asarray(b),
            factor_dtype=jnp.float64, refine_iterations=0,
        )
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-10)

    def test_lu_mixed_precision_refinement(self, small_system):
        """f32 factorization + f64 refinement must reach f64-level accuracy."""
        domain, a0, a1, a2, b = small_system
        a = oracles.assemble(
            domain[5], a0, a1, a2, lambda t: 1.0, lambda t: t, lambda t: t**2
        )
        x_ref = np.linalg.solve(a, b)
        x32 = lu_solve_refined(
            jnp.asarray(a), jnp.asarray(b),
            factor_dtype=jnp.float32, refine_iterations=0,
        )
        x_ref32 = np.linalg.norm(np.asarray(x32) - x_ref) / np.linalg.norm(x_ref)
        x_mixed = lu_solve_refined(
            jnp.asarray(a), jnp.asarray(b),
            factor_dtype=jnp.float32, refine_iterations=3,
        )
        rel = np.linalg.norm(np.asarray(x_mixed) - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-12, rel
        assert rel < x_ref32 / 100

    def test_complex_system(self):
        key = jax.random.PRNGKey(3)
        n = 32
        a = (
            jax.random.normal(key, (n, n), dtype=jnp.float64)
            + 1j * jax.random.normal(jax.random.PRNGKey(4), (n, n), dtype=jnp.float64)
            + 10 * jnp.eye(n)
        )
        b = jax.random.normal(jax.random.PRNGKey(5), (n, 2), dtype=jnp.float64) + 0j
        x = lu_solve_refined(a, b, factor_dtype=jnp.complex64, refine_iterations=3)
        np.testing.assert_allclose(
            np.asarray(a @ x), np.asarray(b), atol=1e-10
        )

    def test_solve_point_vs_oracle(self, small_system):
        domain, a0, a1, a2, b = small_system
        sys = make_sys(small_system)
        x = solve_point(sys, sys.domain[7], CFG64)
        x_ref = oracles.solve_point(
            domain[7], a0, a1, a2, b,
            lambda t: 1.0, lambda t: t, lambda t: t**2, lambda t: t,
        )
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9)

    def test_solve_sweep_vs_oracle(self, small_system):
        domain, a0, a1, a2, b = small_system
        sys = make_sys(small_system)
        xs = solve_sweep(sys, CFG64.replace(solve_chunk=3))
        x_ref = oracles.full_sweep(
            domain, a0, a1, a2, b,
            lambda t: 1.0, lambda t: t, lambda t: t**2, lambda t: t,
        )
        assert xs.shape == (len(domain), a0.shape[0], b.shape[1])
        np.testing.assert_allclose(np.asarray(xs), x_ref, rtol=1e-8, atol=1e-12)

    def test_solve_sweep_mixed_matches_f64(self, small_system):
        sys = make_sys(small_system)
        xs_mixed = solve_sweep(sys, CFG_MIXED.replace(solve_chunk=7))
        xs_64 = solve_sweep(sys, CFG64)
        rel = np.linalg.norm(np.asarray(xs_mixed - xs_64)) / np.linalg.norm(
            np.asarray(xs_64)
        )
        assert rel < 1e-12, rel


class TestOrthonormalize:
    def test_svd_orthonormal(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (64, 10), dtype=jnp.float64)
        u = orthonormalize_svd(q)
        np.testing.assert_allclose(
            np.asarray(u.T @ u), np.eye(10), atol=1e-12
        )
        # spans the same space: projector equality
        p1 = np.asarray(u @ u.T)
        qq, _ = np.linalg.qr(np.asarray(q))
        np.testing.assert_allclose(p1, qq @ qq.T, atol=1e-10)

    def test_svd_masked_padding(self):
        key = jax.random.PRNGKey(1)
        q = jnp.zeros((64, 12), dtype=jnp.float64)
        active = jax.random.normal(key, (64, 5), dtype=jnp.float64)
        q = q.at[:, :5].set(active)
        u = orthonormalize_svd_masked(q, jnp.asarray(5))
        u = np.asarray(u)
        assert np.all(u[:, 5:] == 0.0)
        np.testing.assert_allclose(u[:, :5].T @ u[:, :5], np.eye(5), atol=1e-12)
        p1 = u[:, :5] @ u[:, :5].T
        qq, _ = np.linalg.qr(np.asarray(active))
        np.testing.assert_allclose(p1, qq @ qq.T, atol=1e-10)

    def test_cgs2_append(self):
        key = jax.random.PRNGKey(2)
        base = np.linalg.qr(
            np.asarray(jax.random.normal(key, (64, 6), dtype=jnp.float64))
        )[0]
        q = jnp.zeros((64, 12), dtype=jnp.float64).at[:, :6].set(base)
        new = jax.random.normal(jax.random.PRNGKey(3), (64, 3), dtype=jnp.float64)
        q2, nc = orthonormalize_append_cgs2(q, jnp.asarray(6), new)
        assert int(nc) == 9
        q2 = np.asarray(q2)
        np.testing.assert_allclose(
            q2[:, :9].T @ q2[:, :9], np.eye(9), atol=1e-12
        )
        # existing base unchanged
        np.testing.assert_allclose(q2[:, :6], base)
        # span includes the new vectors
        proj = q2[:, :9] @ (q2[:, :9].T @ np.asarray(new))
        np.testing.assert_allclose(proj, np.asarray(new), atol=1e-10)

    def test_column_mask(self):
        m = np.asarray(column_mask(8, jnp.asarray(3)))
        np.testing.assert_array_equal(m, [1, 1, 1, 0, 0, 0, 0, 0])


class TestCholeskyQRRefine:
    def test_refines_perturbed_basis(self):
        from morfem_tpu.ops.orthonormalize import cholesky_qr_refine

        rng = np.random.default_rng(0)
        q = np.linalg.qr(rng.normal(size=(200, 12)))[0]
        # perturb like TPU's large-N SVD (~3e-7 off orthonormal)
        q_bad = q + 3e-7 * rng.normal(size=q.shape)
        q_ref = np.asarray(cholesky_qr_refine(jnp.asarray(q_bad)))
        orth = np.abs(q_ref.T @ q_ref - np.eye(12)).max()
        assert orth < 1e-13, orth
        # span preserved
        p1 = q_ref @ q_ref.T
        p2 = q_bad @ np.linalg.inv(q_bad.T @ q_bad) @ q_bad.T
        np.testing.assert_allclose(p1, p2, atol=1e-10)

    def test_masked_padding_stays_zero(self):
        from morfem_tpu.ops.orthonormalize import cholesky_qr_refine

        rng = np.random.default_rng(1)
        q = np.zeros((100, 10))
        q[:, :6] = np.linalg.qr(rng.normal(size=(100, 6)))[0]
        mask = jnp.asarray((np.arange(10) < 6).astype(float))
        out = np.asarray(cholesky_qr_refine(jnp.asarray(q), mask))
        assert np.all(out[:, 6:] == 0.0)
        np.testing.assert_allclose(
            out[:, :6].T @ out[:, :6], np.eye(6), atol=1e-13
        )

    def test_singular_input_passthrough(self):
        from morfem_tpu.ops.orthonormalize import cholesky_qr_refine

        q = jnp.zeros((50, 4), jnp.float64)
        out = cholesky_qr_refine(q)
        assert np.all(np.asarray(out) == 0.0)


class TestSymmetricOpsHint:
    def test_detected_and_bit_identical(self, rng):
        """symmetric_ops: exactly-symmetric operators skip the (A+Aᵀ)/2
        pass, which must be a bit-exact no-op — and asymmetric operators
        must NOT take the shortcut."""
        from morfem_tpu.ops.assembly import assemble_at, system_matrix
        from morfem_tpu.system import AffineSystem

        n = 24
        s = rng.standard_normal((n, n))
        s = (s + s.T) * 0.5
        b = rng.standard_normal((n, 2))
        dom = np.linspace(1.0, 2.0, 5)
        sym_sys = AffineSystem.create(dom, s, 0 * s, -s, b)
        assert sym_sys.symmetric_ops
        a_fast, _ = assemble_at(sym_sys, jnp.asarray(dom), symmetrize=True)
        c, _ = sym_sys.coefficients(jnp.asarray(dom))
        a_ref = system_matrix(sym_sys.operators(), c, symmetrize=True)
        np.testing.assert_array_equal(np.asarray(a_fast), np.asarray(a_ref))

        g = rng.standard_normal((n, n))  # generic: not symmetric
        asym_sys = AffineSystem.create(dom, g, 0 * g, -g, b)
        assert not asym_sys.symmetric_ops
        a_asym, _ = assemble_at(asym_sys, jnp.asarray(dom), symmetrize=True)
        c2, _ = asym_sys.coefficients(jnp.asarray(dom))
        a_ref2 = system_matrix(asym_sys.operators(), c2, symmetrize=True)
        np.testing.assert_array_equal(
            np.asarray(a_asym), np.asarray(a_ref2)
        )
        # and the symmetrization really happened on the asymmetric system
        assert np.allclose(
            np.asarray(a_asym[0]), np.asarray(a_asym[0]).T
        )

    def test_traced_construction_defaults_false(self):
        from morfem_tpu.system import AffineSystem

        def build(a):
            sys = AffineSystem.create(
                np.linspace(1, 2, 3), a, 0.0 * a, -a, a[:, :1]
            )
            assert not sys.symmetric_ops  # tracer → hint must stay off
            return sys.a0

        a = jnp.eye(8, dtype=jnp.float64)
        jax.jit(build)(a)
