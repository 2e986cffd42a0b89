"""Tests for the MOR engine: estimator, greedy/equally basis, public API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import (
    AffineSystem,
    MorfemConfig,
    build_reduced_model,
    equally_distributed_basis,
    estimate_errors,
    estimator_blocks,
    greedy_basis,
    morfem,
    project,
    solve_sweep,
    sweep,
)
from morfem_tpu.mor.equally import seed_indices
from morfem_tpu.mor.greedy import max_basis_columns
from morfem_tpu.utils.synthetic import random_affine_system

import oracles

CFG = MorfemConfig(
    factor_dtype_name="float64", refine_iterations=0, max_greedy_iterations=20
)


@pytest.fixture(scope="module")
def system():
    key = jax.random.PRNGKey(11)
    domain, a0, a1, a2, b = random_affine_system(key, n=64, m=2, num_points=40)
    return tuple(np.asarray(v) for v in (domain, a0, a1, a2, b))


@pytest.fixture(scope="module")
def sys_obj(system):
    domain, a0, a1, a2, b = system
    return AffineSystem.create(domain, a0, a1, a2, b)


class TestEstimator:
    def test_estimator_matches_exact_residual_gram(self, system, sys_obj):
        """The 16-block algebraic estimate must equal ‖RᴴR‖_F computed
        explicitly from the full-order residual."""
        domain, a0, a1, a2, b = system
        # basis from a few exact snapshots (padded into K=8 with 5 active)
        snaps = np.concatenate(
            [
                oracles.solve_point(
                    domain[j], a0, a1, a2, b, *oracles.default_wave_coeffs()
                )
                for j in (0, 20)
            ],
            axis=1,
        )
        q_active = np.linalg.svd(snaps, full_matrices=False)[0][:, :4]
        k = 8
        q = jnp.zeros((a0.shape[0], k), dtype=jnp.float64).at[:, :4].set(q_active)
        ncols = jnp.asarray(4)

        blocks, u = estimator_blocks(sys_obj, q, ncols)
        rm = project(sys_obj, q * (jnp.arange(k) < ncols), ncols)
        err, x_r = estimate_errors(rm, blocks, CFG)

        err_ref = oracles.residual_gram_norm(
            domain, np.asarray(q), np.asarray(x_r), a0, a1, a2, b,
            *oracles.default_wave_coeffs(),
        )
        np.testing.assert_allclose(np.asarray(err), err_ref, rtol=1e-6, atol=1e-12)

    def test_direct_estimator_matches_gram_estimator(self, system, sys_obj):
        """Both estimators compute ‖RᴴR‖_F; in CPU f64 they must agree to
        the Gram path's cancellation floor."""
        from morfem_tpu.mor.estimator import estimate_errors_direct
        from morfem_tpu import project

        domain, a0, a1, a2, b = system
        snaps = np.concatenate(
            [
                oracles.solve_point(
                    domain[j], a0, a1, a2, b, *oracles.default_wave_coeffs()
                )
                for j in (0, 39)
            ],
            axis=1,
        )
        q_active = np.linalg.svd(snaps, full_matrices=False)[0]
        k = 8
        q = (
            jnp.zeros((a0.shape[0], k), dtype=jnp.float64)
            .at[:, :4]
            .set(q_active)
        )
        ncols = jnp.asarray(4)
        blocks, u = estimator_blocks(sys_obj, q, ncols)
        rm = project(sys_obj, q * (jnp.arange(k) < ncols), ncols)
        err_gram, _ = estimate_errors(rm, blocks, CFG)
        err_direct, _ = estimate_errors_direct(
            rm, u, sys_obj.b, CFG.replace(estimator_chunk=7)
        )
        # atol = the gram path's cancellation floor (it reports ~1e-13 at
        # points where the true residual is ~0; the direct path reports the
        # true ~1e-28 there)
        np.testing.assert_allclose(
            np.asarray(err_direct), np.asarray(err_gram), rtol=1e-5, atol=5e-12
        )

    def test_direct_estimator_ozaki_impl_matches_einsum(self, system, sys_obj):
        """The flat-bf16 residual product + f32 norm (the TPU compile-
        cheap formulation) agrees with the emulated-f64 einsum form well
        inside the estimator's job (argmax + threshold)."""
        from morfem_tpu.mor.estimator import estimate_errors_direct
        from morfem_tpu import project

        domain, a0, a1, a2, b = system
        snaps = np.concatenate(
            [
                oracles.solve_point(
                    domain[j], a0, a1, a2, b, *oracles.default_wave_coeffs()
                )
                for j in (0, 39)
            ],
            axis=1,
        )
        q_active = np.linalg.svd(snaps, full_matrices=False)[0]
        k = 8
        q = (
            jnp.zeros((a0.shape[0], k), dtype=jnp.float64)
            .at[:, :4]
            .set(q_active)
        )
        ncols = jnp.asarray(4)
        _, u = estimator_blocks(sys_obj, q, ncols)
        rm = project(sys_obj, q * (jnp.arange(k) < ncols), ncols)
        err_ein, _ = estimate_errors_direct(rm, u, sys_obj.b, CFG, impl="einsum")
        err_oz, _ = estimate_errors_direct(rm, u, sys_obj.b, CFG, impl="ozaki")
        # floors: the bf16-slice product truncates terms ~2e-15·‖U‖‖x‖
        # below the leading scale, the f32 norm adds ~1e-7 relative
        np.testing.assert_allclose(
            np.asarray(err_oz),
            np.asarray(err_ein),
            rtol=1e-5,
            atol=float(jnp.max(err_ein)) * 1e-12,
        )

    def test_direct_estimator_rejects_bad_impl(self, system, sys_obj):
        from morfem_tpu.mor.estimator import estimate_errors_direct
        from morfem_tpu import project

        q = jnp.zeros((system[1].shape[0], 4), jnp.float64)
        rm = project(sys_obj, q, jnp.asarray(0))
        u = jnp.zeros((3,) + q.shape, jnp.float64)
        with pytest.raises(ValueError, match="impl"):
            estimate_errors_direct(rm, u, sys_obj.b, CFG, impl="fast")
        with pytest.raises(ValueError, match="estimator_impl"):
            MorfemConfig(estimator_impl="fast")

    def test_greedy_matches_across_estimator_impls(self, system, sys_obj):
        """estimator_impl only changes HOW the residual product is
        computed; the greedy must pick the same points either way."""
        res_e = greedy_basis(sys_obj, CFG.replace(estimator_impl="einsum"))
        res_o = greedy_basis(sys_obj, CFG.replace(estimator_impl="ozaki"))
        assert int(res_e.ncols) == int(res_o.ncols)
        np.testing.assert_allclose(
            np.asarray(res_e.q), np.asarray(res_o.q), rtol=0, atol=1e-9
        )

    def test_greedy_direct_vs_gram_same_result(self, system, sys_obj):
        res_d = greedy_basis(sys_obj, CFG.replace(estimator="direct"))
        res_g = greedy_basis(sys_obj, CFG.replace(estimator="gram"))
        assert int(res_d.ncols) == int(res_g.ncols)
        np.testing.assert_allclose(
            np.asarray(res_d.q), np.asarray(res_g.q), atol=1e-8
        )

    def test_blocks_reduce_to_expected_contractions(self, system, sys_obj):
        domain, a0, a1, a2, b = system
        q_active = np.linalg.qr(np.random.default_rng(0).normal(size=(64, 3)))[0]
        q = jnp.zeros((64, 6), dtype=jnp.float64).at[:, :3].set(q_active)
        blocks, u = estimator_blocks(sys_obj, q, jnp.asarray(3))
        ops = [a0, a1, a2]
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(u[i][:, :3]), ops[i] @ q_active, rtol=1e-12
            )
            for j in range(3):
                ref = (ops[i] @ q_active).conj().T @ (ops[j] @ q_active)
                np.testing.assert_allclose(
                    np.asarray(blocks.g[i, j][:3, :3]), ref, rtol=1e-10
                )
            np.testing.assert_allclose(
                np.asarray(blocks.gb[i][:3]),
                (ops[i] @ q_active).conj().T @ b,
                rtol=1e-10,
            )
        np.testing.assert_allclose(np.asarray(blocks.bb), b.T @ b, rtol=1e-12)


class TestGreedy:
    def test_converges_and_reduces(self, system, sys_obj):
        domain, a0, a1, a2, b = system
        res = greedy_basis(sys_obj, CFG)
        assert bool(res.converged)
        nc = int(res.ncols)
        assert nc >= 4
        q = np.asarray(res.q)[:, :nc]
        np.testing.assert_allclose(q.T @ q, np.eye(nc), atol=1e-10)
        # error history: monotone-ish decrease of the max estimator error
        iters = int(res.iterations)
        hist = np.asarray(res.err_hist)[:iters]
        assert hist.shape[1] == len(domain)
        assert hist[-1].max() < CFG.error_threshold
        assert hist[0].max() > hist[-1].max()

    def test_reduced_solution_accuracy(self, system, sys_obj):
        domain, a0, a1, a2, b = system
        rm, res = build_reduced_model(sys_obj, CFG)
        x_r = sweep(rm, CFG)
        x_rec = np.einsum("nk,ikm->inm", np.asarray(rm.q), np.asarray(x_r))
        x_full = oracles.full_sweep(
            domain, a0, a1, a2, b, *oracles.default_wave_coeffs()
        )
        rel = np.linalg.norm(x_rec - x_full) / np.linalg.norm(x_full)
        assert rel < 1e-6, rel

    def test_max_iters_budget(self, sys_obj):
        cfg = CFG.replace(max_greedy_iterations=1, error_threshold=1e-30)
        res = greedy_basis(sys_obj, cfg)
        assert not bool(res.converged)
        assert int(res.ncols) == max_basis_columns(sys_obj.m, cfg)

    def test_stagnation_guard_stops_without_nan(self, sys_obj):
        """Unreachable threshold → the greedy must stop when new snapshots
        stop being linearly independent (dependency_tolerance), not burn
        the whole column budget appending duplicates (which drives the
        basis rank-deficient and NaNs TPU's emulated-f64 SVD)."""
        cfg = CFG.replace(
            max_greedy_iterations=30,
            error_threshold=1e-300,
            factor_dtype_name="float32",  # realistic accuracy floor
            refine_iterations=2,
        )
        res = greedy_basis(sys_obj, cfg)
        assert not bool(res.converged)
        # stopped well short of the 64-column budget
        assert int(res.ncols) < max_basis_columns(sys_obj.m, cfg)
        assert not bool(jnp.isnan(res.q).any())
        nc = int(res.ncols)
        q = np.asarray(res.q)[:, :nc]
        np.testing.assert_allclose(q.T @ q, np.eye(nc), atol=1e-9)

    def test_dependent_second_seed_still_estimates(self):
        """A t-independent system makes the domain-endpoint seeds
        identical: the dependent second seed must be SKIPPED (not
        appended, not a termination) and the estimator phase must still
        run — on a constant system the one-seed reduced model is exact,
        so the greedy converges with a single seed's columns."""
        key = jax.random.PRNGKey(5)
        n, m = 48, 2
        g = jax.random.normal(key, (n, n), jnp.float64)
        a0 = (g + g.T) * 0.5 + n * jnp.eye(n)  # symmetric: estimator uses
        # the RAW operators while solves see the symmetrized matrix
        b = jax.random.normal(jax.random.PRNGKey(6), (n, m), jnp.float64)
        domain = jnp.linspace(1.0, 2.0, 16)
        one = lambda t: jnp.ones_like(t)  # noqa: E731
        zero = lambda t: jnp.zeros_like(t)  # noqa: E731
        sys_const = AffineSystem(
            domain, a0, jnp.zeros_like(a0), jnp.zeros_like(a0), b,
            one, zero, zero, one,
        )
        res = greedy_basis(sys_const, CFG)
        assert bool(res.converged)
        assert int(res.ncols) == m
        assert int(res.iterations) >= 1  # the estimator DID run

    def test_basis_saturation_yields_no_zero_columns(self):
        """N < 2m: the padded width exceeds N, so the second seed can only
        add N − m independent columns. ncols must count the columns the
        orthonormalization actually produced — a zero column under the
        active mask makes every reduced system singular (NaN sweeps)."""
        rng = np.random.default_rng(3)
        n, m = 3, 2
        g = rng.standard_normal((n, n))
        a0 = (g + g.T) * 0.5 + 4 * n * np.eye(n)
        b = rng.standard_normal((n, m))
        domain = np.linspace(0.5, 1.5, 5)
        sys_small = AffineSystem.create(
            domain, a0, np.zeros((n, n)), -np.eye(n), b
        )
        for ortho in ("svd", "mgs"):
            cfg = CFG.replace(
                error_threshold=1e-12, orthonormalization=ortho
            )
            res = greedy_basis(sys_small, cfg)
            nc = int(res.ncols)
            assert nc <= n
            q = np.asarray(res.q)[:, :nc]
            # every active column is genuinely orthonormal — no zeros
            np.testing.assert_allclose(
                np.sum(np.abs(q) ** 2, axis=0), np.ones(nc), atol=1e-10
            )
            rm = project(sys_small, res.q, res.ncols).trim()
            x = sweep(rm, cfg)
            assert bool(jnp.isfinite(x).all()), ortho

    def test_greedy_jits_end_to_end(self, sys_obj):
        fn = jax.jit(lambda s: greedy_basis(s, CFG))
        res = fn(sys_obj)
        assert bool(res.converged)

    def test_mgs_variant_matches_svd_space(self, system, sys_obj):
        cfg_mgs = CFG.replace(orthonormalization="mgs")
        res_svd = greedy_basis(sys_obj, CFG)
        res_mgs = greedy_basis(sys_obj, cfg_mgs)
        assert bool(res_mgs.converged)
        # both reach threshold; bases span comparable subspaces (projector
        # distance small where both converged to same snapshot set)
        n_svd, n_mgs = int(res_svd.ncols), int(res_mgs.ncols)
        q1 = np.asarray(res_svd.q)[:, :n_svd]
        q2 = np.asarray(res_mgs.q)[:, :n_mgs]
        np.testing.assert_allclose(q2.T @ q2, np.eye(n_mgs), atol=1e-10)


class TestEqually:
    def test_seed_indices_match_numpy_linspace(self):
        cfg = MorfemConfig(equally_distributed_reduction_rate=0.97)
        idx = seed_indices(100, cfg)
        ref = np.linspace(0, 99, int(100 * (1 - 0.97))).astype(int)
        np.testing.assert_array_equal(idx, ref)

    def test_basis_and_accuracy(self, system, sys_obj):
        domain, a0, a1, a2, b = system
        q = equally_distributed_basis(sys_obj, CFG, count=6)
        q_np = np.asarray(q)
        assert q_np.shape == (64, 12)
        np.testing.assert_allclose(q_np.T @ q_np, np.eye(12), atol=1e-10)
        rm = project(sys_obj, q)
        x_r = sweep(rm, CFG)
        x_rec = np.einsum("nk,ikm->inm", q_np, np.asarray(x_r))
        x_full = oracles.full_sweep(
            domain, a0, a1, a2, b, *oracles.default_wave_coeffs()
        )
        rel = np.linalg.norm(x_rec - x_full) / np.linalg.norm(x_full)
        assert rel < 1e-5, rel


class TestPublicAPI:
    def test_shape_contract(self, system):
        domain, a0, a1, a2, b = system
        x, q, r0, r1, r2, b_r = morfem(domain, a0, a1, a2, b, config=CFG)
        nr = q.shape[1]
        assert x.shape == (len(domain), nr, 2)
        assert r0.shape == r1.shape == r2.shape == (nr, nr)
        assert b_r.shape == (nr, 2)
        np.testing.assert_allclose(
            np.asarray(r0), np.asarray(q).T @ a0 @ np.asarray(q), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(b_r), np.asarray(q).T @ b, atol=1e-12
        )

    def test_equivalent_call_forms(self, system):
        """reference docs/source/index.rst:52-62: (G − t²C)X = tB can be
        phrased with the C addend in slot a1 or a2."""
        domain, a0, a1, a2, b = system
        g, c = a0, a2
        zero = np.zeros_like(g)
        x1, q1, *_ = morfem(
            domain, g, zero, c, b, t_a2=lambda t: -(t**2), config=CFG
        )
        x2, q2, *_ = morfem(
            domain, g, c, zero, b, t_a1=lambda t: -(t**2), config=CFG
        )
        rec1 = np.einsum("nk,ikm->inm", np.asarray(q1), np.asarray(x1))
        rec2 = np.einsum("nk,ikm->inm", np.asarray(q2), np.asarray(x2))
        np.testing.assert_allclose(rec1, rec2, rtol=1e-6, atol=1e-10)

    def test_equally_distributed_flag(self, system):
        domain, a0, a1, a2, b = system
        cfg = CFG.replace(
            use_equally_distributed=True,
            equally_distributed_reduction_rate=0.85,
        )
        x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
        assert q.shape[1] == len(seed_indices(len(domain), cfg)) * 2

    def test_full_vs_reduced_sweep_parity(self, system, sys_obj):
        """End-to-end acceptance: MOR solutions reconstruct the full-order
        sweep to near working precision (BASELINE.md: ≤1e-8 target)."""
        domain, a0, a1, a2, b = system
        cfg = CFG.replace(error_threshold=1e-14)
        x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
        x_full = np.asarray(solve_sweep(sys_obj, cfg))
        rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
        rel = np.linalg.norm(rec - x_full) / np.linalg.norm(x_full)
        assert rel < 1e-8, rel


def test_morfem_warns_when_x64_disabled():
    """f64 inputs + disabled x64 mode silently run f32 (accuracy floors
    at ~5e-8 instead of ~1e-10) — morfem() must say so (round 3: a drive
    script that forgot the flag chased a phantom on-chip accuracy bug)."""
    import warnings

    import jax

    import morfem_tpu.mor.api as api

    a0 = np.eye(16) * 4.0
    a1 = np.zeros((16, 16))
    a2 = -np.eye(16)
    b = np.ones((16, 1))
    dom = np.linspace(0.3, 0.6, 5)
    cfg = MorfemConfig(
        use_equally_distributed=True, equally_distributed_reduction_rate=0.5
    )
    old_flag = api._warned_x64
    try:
        api._warned_x64 = False
        jax.config.update("jax_enable_x64", False)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            morfem(dom, a0, a1, a2, b, config=cfg)
        assert any("x64 mode is DISABLED" in str(x.message) for x in w)
        # ... and only once
        api._warned_x64 = True
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            morfem(dom, a0, a1, a2, b, config=cfg)
        assert not any("x64 mode is DISABLED" in str(x.message) for x in w)
    finally:
        jax.config.update("jax_enable_x64", True)
        api._warned_x64 = old_flag


def test_morfem_warns_when_greedy_unconverged(system):
    """The reference's greedy loops until threshold no matter what
    (implementation.py:269); this package caps at max_greedy_iterations
    and must WARN when the cap (or stagnation) ends the loop early —
    otherwise an unconverged basis ships silently (round-3 verdict,
    'unbounded greedy growth semantics')."""
    import warnings

    domain, a0, a1, a2, b = system
    cfg = CFG.replace(max_greedy_iterations=1, error_threshold=1e-300)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        morfem(domain, a0, a1, a2, b, config=cfg)
    assert any("WITHOUT reaching" in str(x.message) for x in w)

    # a converged run must stay silent
    cfg_ok = CFG.replace(error_threshold=1e-6)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        morfem(domain, a0, a1, a2, b, config=cfg_ok)
    assert not any("WITHOUT reaching" in str(x.message) for x in w)
