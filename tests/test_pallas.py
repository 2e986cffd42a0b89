"""Pallas kernel tests — interpreter mode on CPU, validated vs XLA paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import AffineSystem, MorfemConfig, project
from morfem_tpu.mor.reduced import assemble_reduced, solve_reduced_batch, sweep
from morfem_tpu.ops.pallas.reduced_sweep import (
    gauss_jordan_sweep_solve,
    pallas_reduced_sweep,
)
from morfem_tpu.utils.synthetic import random_affine_system

CFG = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)


@pytest.fixture(scope="module")
def reduced_problem():
    key = jax.random.PRNGKey(5)
    domain, a0, a1, a2, b = random_affine_system(key, n=96, m=2, num_points=40)
    sys = AffineSystem.create(domain, a0, a1, a2, b)
    from morfem_tpu import equally_distributed_basis

    q = equally_distributed_basis(sys, CFG, count=7)  # K = 14
    rm = project(sys, q)
    return sys, rm


class TestGaussJordanKernel:
    def test_matches_xla_batched_lu(self, reduced_problem):
        sys, rm = reduced_problem
        c, cb = rm.coefficients(rm.domain)
        mask = jnp.ones((rm.k,), jnp.float64)
        rhs = cb[:, None, None] * rm.b_r
        x_gj = gauss_jordan_sweep_solve(
            rm.r0, rm.r1, rm.r2, c, rhs, 1.0 - mask, interpret=True
        )
        a, rhs_x = assemble_reduced(rm, rm.domain, CFG)
        x_lu = solve_reduced_batch(a, rhs_x, CFG)
        # f32 kernel vs f64 LU: agreement to f32 accuracy
        rel = np.linalg.norm(np.asarray(x_gj, np.float64) - np.asarray(x_lu)) / (
            np.linalg.norm(np.asarray(x_lu))
        )
        assert rel < 1e-4, rel

    def test_padding_and_masking(self, reduced_problem):
        """Inactive columns (identity diagonal) must yield zero solution
        rows and not disturb the active block."""
        sys, rm = reduced_problem
        k = rm.k
        kbig = k + 5
        r0 = jnp.zeros((kbig, kbig)).at[:k, :k].set(rm.r0)
        r1 = jnp.zeros((kbig, kbig)).at[:k, :k].set(rm.r1)
        r2 = jnp.zeros((kbig, kbig)).at[:k, :k].set(rm.r2)
        c, cb = rm.coefficients(rm.domain)
        rhs = jnp.zeros((c.shape[0], kbig, rm.m))
        rhs = rhs.at[:, :k].set(cb[:, None, None] * rm.b_r)
        inactive = jnp.zeros((kbig,)).at[k:].set(1.0)
        x = gauss_jordan_sweep_solve(
            r0, r1, r2, c, rhs, inactive, interpret=True
        )
        x = np.asarray(x)
        assert np.all(x[:, k:] == 0.0)
        x_ref = gauss_jordan_sweep_solve(
            rm.r0, rm.r1, rm.r2, c,
            cb[:, None, None] * rm.b_r, jnp.zeros((k,)), interpret=True,
        )
        np.testing.assert_allclose(x[:, :k], np.asarray(x_ref), rtol=1e-5)

    def test_non_divisible_grid(self, reduced_problem):
        """I not a multiple of the tile size must still come out right."""
        sys, rm = reduced_problem
        c, cb = rm.coefficients(rm.domain)
        rhs = cb[:, None, None] * rm.b_r
        x_all = gauss_jordan_sweep_solve(
            rm.r0, rm.r1, rm.r2, c, rhs, jnp.zeros((rm.k,)), interpret=True
        )
        x_13 = gauss_jordan_sweep_solve(
            rm.r0, rm.r1, rm.r2, c[:13], rhs[:13], jnp.zeros((rm.k,)),
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(x_all[:13]), np.asarray(x_13), rtol=1e-6
        )


class TestPallasSweep:
    def test_refined_sweep_matches_f64_lu(self, reduced_problem, monkeypatch):
        """pallas_reduced_sweep (f32 kernel + f64 refinement) must match
        the f64 XLA path to near working precision."""
        import morfem_tpu.ops.pallas.reduced_sweep as mod

        orig = mod.gauss_jordan_sweep_solve
        monkeypatch.setattr(
            mod,
            "gauss_jordan_sweep_solve",
            lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
        )
        sys, rm = reduced_problem
        cfg = MorfemConfig(refine_iterations=3)
        x_pallas = pallas_reduced_sweep(rm, rm.domain, cfg)
        x_lu = sweep(rm, CFG)
        rel = np.linalg.norm(np.asarray(x_pallas - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-10, rel
