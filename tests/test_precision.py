"""Tests for the chunked f64-precise matmul."""

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.ops.precision import (
    F64_SAFE_CONTRACTION,
    precise_gram,
    precise_matmul,
)


def test_matches_numpy_beyond_threshold():
    rng = np.random.default_rng(0)
    n = F64_SAFE_CONTRACTION * 3 + 123  # forces 4 chunks incl. remainder
    a = rng.normal(size=(8, n))
    b = rng.normal(size=(n, 5))
    got = np.asarray(precise_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, a @ b, rtol=1e-13)


def test_small_passthrough_and_vector_rhs():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(6, 100))
    b = rng.normal(size=(100,))
    got = np.asarray(precise_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, a @ b, rtol=1e-13)
    # vector rhs through the chunked path
    n = F64_SAFE_CONTRACTION + 1000
    a = rng.normal(size=(6, n))
    b = rng.normal(size=(n,))
    got = np.asarray(precise_matmul(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (6,)
    np.testing.assert_allclose(got, a @ b, rtol=1e-13)


def test_gram_and_complex():
    rng = np.random.default_rng(2)
    n = F64_SAFE_CONTRACTION + 777
    q = rng.normal(size=(n, 7)) + 1j * rng.normal(size=(n, 7))
    got = np.asarray(precise_gram(jnp.asarray(q).conj(), jnp.asarray(q)))
    np.testing.assert_allclose(got, q.conj().T @ q, rtol=1e-13)


def test_batched():
    rng = np.random.default_rng(3)
    n = F64_SAFE_CONTRACTION + 600
    a = rng.normal(size=(3, 4, n))
    b = rng.normal(size=(n, 2))  # broadcast
    got = np.asarray(precise_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, a @ b, rtol=1e-13)


def test_f32_passthrough():
    rng = np.random.default_rng(4)
    n = F64_SAFE_CONTRACTION * 2
    a = jnp.asarray(rng.normal(size=(4, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    got = precise_matmul(a, b)
    assert got.dtype == jnp.float32


class TestKrylov:
    def test_bicgstab_block(self):
        from morfem_tpu.ops.krylov import bicgstab

        rng = np.random.default_rng(0)
        n = 80
        a = rng.normal(size=(n, n)) / n + np.eye(n) * 4
        a = (a + a.T) / 2
        b = rng.normal(size=(n, 3))
        aj = jnp.asarray(a)
        x, rel = bicgstab(lambda v: aj @ v, jnp.asarray(b), tol=1e-12)
        assert float(jnp.max(rel)) < 1e-10
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(a, b), rtol=1e-7, atol=1e-10
        )

    def test_gmres_nonsymmetric(self):
        from morfem_tpu.ops.krylov import gmres

        rng = np.random.default_rng(1)
        n = 60
        a = rng.normal(size=(n, n)) / n + np.eye(n) * 3  # nonsymmetric
        b = rng.normal(size=(n, 2))
        aj = jnp.asarray(a)
        x, rel = gmres(lambda v: aj @ v, jnp.asarray(b), tol=1e-11,
                       restart=20, maxiter=20)
        assert float(jnp.max(rel)) < 1e-10, float(jnp.max(rel))
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(a, b), rtol=1e-6, atol=1e-9
        )

    def test_gmres_preconditioned_vector(self):
        from morfem_tpu.ops.krylov import gmres

        rng = np.random.default_rng(2)
        n = 50
        d = rng.uniform(1, 100, size=n)
        a = np.diag(d) + rng.normal(size=(n, n)) / n
        b = rng.normal(size=n)
        aj = jnp.asarray(a)
        dj = jnp.asarray(d)
        x, rel = gmres(
            lambda v: aj @ v, jnp.asarray(b),
            precond=lambda v: v / dj[:, None] if v.ndim == 2 else v / dj,
            tol=1e-11, restart=25, maxiter=10,
        )
        assert float(rel) < 1e-10
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(a, b), rtol=1e-6, atol=1e-9
        )
