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


class TestOzakiMatmul:
    """f64-exact matmul via integer-valued bf16 MXU passes (Ozaki scheme).

    The TPU replacement for XLA's emulated f64 matmul inside refinement
    loops (see ops/precision.py::ozaki_matmul). These tests run the exact
    same pass structure on CPU — exactness is a property of the arithmetic
    (integer partial sums < 2^24 in f32), not of the backend.
    """

    def test_exact_vs_numpy_various_k(self):
        from morfem_tpu.ops.precision import ozaki_matmul, ozaki_params

        rng = np.random.default_rng(0)
        for k, m, n in [(300, 32, 8), (3411, 64, 2), (40000, 8, 4)]:
            beta, q = ozaki_params(k)
            assert (2 ** (2 * beta)) * k <= 2 ** 24  # exactness condition
            a = rng.normal(size=(m, k)) * np.exp(rng.normal(size=(m, 1)) * 4)
            b = rng.normal(size=(k, n)) * np.exp(rng.normal(size=(1, n)) * 4)
            ref = a @ b
            got = np.asarray(ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
            rel = np.abs(got - ref).max() / np.abs(ref).max()
            assert rel < 5e-15, f"K={k}: {rel:.2e}"

    def test_dynamic_range_and_cancellation(self):
        from morfem_tpu.ops.precision import ozaki_matmul

        rng = np.random.default_rng(1)
        a = rng.normal(size=(16, 2000))
        a[:, ::7] *= 1e12  # 1e12 dynamic range within rows
        b = rng.normal(size=(2000, 4))
        b[::3] *= 1e-9
        ref = a @ b
        got = np.asarray(ozaki_matmul(jnp.asarray(a), jnp.asarray(b)))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-15
        # residual-style cancellation: r = A·x − b with b = A·x exactly
        n = 400
        s = rng.normal(size=(n, n)) + 5 * np.eye(n)
        x = rng.normal(size=(n, 2))
        bx = s @ x
        r = np.asarray(ozaki_matmul(jnp.asarray(s), jnp.asarray(x))) - bx
        assert np.abs(r).max() / np.abs(bx).max() < 5e-15

    def test_prepare_apply_matches_and_vmaps(self):
        from morfem_tpu.ops.precision import (
            ozaki_apply,
            ozaki_matmul,
            ozaki_prepare,
        )

        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.normal(size=(300, 300)))
        b = jnp.asarray(rng.normal(size=(300, 2)))
        prep = ozaki_prepare(a)
        np.testing.assert_array_equal(
            np.asarray(ozaki_apply(prep, b)), np.asarray(ozaki_matmul(a, b))
        )
        # vmap over a batch of systems (the solve_batch pattern)
        ab = jnp.asarray(rng.normal(size=(3, 128, 128)))
        bb = jnp.asarray(rng.normal(size=(3, 128, 2)))
        got = jax.vmap(ozaki_matmul)(ab, bb)
        ref = np.einsum("bij,bjk->bik", np.asarray(ab), np.asarray(bb))
        assert np.abs(np.asarray(got) - ref).max() / np.abs(ref).max() < 5e-15
