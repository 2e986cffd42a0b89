"""Tests for the spectral (diagonalized) two-term sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import MorfemConfig, build_reduced_model
from morfem_tpu.apps.waveguide import load_waveguide_data, waveguide_system
from morfem_tpu.mor.reduced import sweep
from morfem_tpu.mor.spectral import prepare_spectral, spectral_sweep
from morfem_tpu.utils.synthetic import random_affine_system
from morfem_tpu.system import AffineSystem

CFG = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)


@pytest.fixture(scope="module")
def waveguide_rm():
    data = load_waveguide_data(n_fallback=160)
    freq = np.linspace(3e9, 5e9, 50)
    sys_ = waveguide_system(freq, data)
    rm, _ = build_reduced_model(sys_, CFG.replace(error_threshold=1e-10))
    return sys_, rm  # padded reduced model


class TestSpectral:
    def test_matches_lu_sweep_padded(self, waveguide_rm):
        sys_, rm = waveguide_rm
        sm = prepare_spectral(rm, CFG)
        x_spec = spectral_sweep(sm)
        x_lu = sweep(rm, CFG)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-10, rel

    def test_matches_lu_sweep_trimmed(self, waveguide_rm):
        sys_, rm = waveguide_rm
        rmt = rm.trim()
        sm = prepare_spectral(rmt, CFG)
        x_spec = spectral_sweep(sm, rmt.domain)
        x_lu = sweep(rmt, CFG)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-10, rel

    def test_dense_regrid(self, waveguide_rm):
        """Re-sweeping an arbitrary denser grid must agree with LU."""
        sys_, rm = waveguide_rm
        rmt = rm.trim()
        sm = prepare_spectral(rmt, CFG)
        dense = jnp.linspace(3.1e9, 4.9e9, 777)
        x_spec = spectral_sweep(sm, dense)
        x_lu = sweep(rmt, CFG, ts=dense)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-10, rel

    def test_rejects_three_term_pencil(self):
        key = jax.random.PRNGKey(0)
        domain, a0, a1, a2, b = random_affine_system(key, n=32, m=2, num_points=8)
        sys_ = AffineSystem.create(domain, a0, a1, a2, b)
        from morfem_tpu import equally_distributed_basis, project

        q = equally_distributed_basis(sys_, CFG, count=3)
        rm = project(sys_, q)
        with pytest.raises(ValueError, match="two-term"):
            prepare_spectral(rm, CFG)

    def test_swapped_spd_role(self):
        """Pencil where R0 (not R2) is the definite term."""
        rng = np.random.default_rng(0)
        k = 10
        r0 = rng.normal(size=(k, k))
        r0 = r0 @ r0.T + np.eye(k)  # SPD
        r2 = rng.normal(size=(k, k))
        r2 = (r2 + r2.T) / 2  # symmetric indefinite
        b_r = rng.normal(size=(k, 2))
        from morfem_tpu.mor.reduced import ReducedModel

        dom = jnp.linspace(0.0, 0.4, 20)  # keep A(t) nonsingular
        rm = ReducedModel(
            domain=dom, q=jnp.eye(k), r0=jnp.asarray(r0),
            r1=jnp.zeros((k, k)), r2=jnp.asarray(r2),
            b_r=jnp.asarray(b_r), ncols=jnp.asarray(k),
            t_a0=lambda t: jnp.ones_like(t), t_a1=lambda t: t,
            t_a2=lambda t: t**2, t_b=lambda t: jnp.ones_like(t),
        )
        sm = prepare_spectral(rm, CFG)
        assert bool(sm.swapped)
        x_spec = spectral_sweep(sm)
        x_lu = sweep(rm, CFG)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-10, rel


class TestSweepMethodDispatch:
    def test_auto_uses_spectral_for_waveguide(self, waveguide_rm):
        """morfem() with sweep_method='auto' must produce spectral-grade
        results on the two-term waveguide pencil, matching 'lu'."""
        from morfem_tpu import morfem

        sys_, rm = waveguide_rm
        a0 = np.asarray(sys_.a0)
        a1 = np.asarray(sys_.a1)
        a2 = np.asarray(sys_.a2)
        b = np.asarray(sys_.b)
        dom = np.asarray(sys_.domain)
        kw = dict(t_b=sys_.t_b)
        x_auto, q_a, *_ = morfem(
            dom, a0, a1, a2, b, config=CFG.replace(sweep_method="auto"), **kw
        )
        x_lu, q_l, *_ = morfem(
            dom, a0, a1, a2, b, config=CFG.replace(sweep_method="lu"), **kw
        )
        rec_a = np.einsum("nk,ikm->inm", np.asarray(q_a), np.asarray(x_auto))
        rec_l = np.einsum("nk,ikm->inm", np.asarray(q_l), np.asarray(x_lu))
        rel = np.linalg.norm(rec_a - rec_l) / np.linalg.norm(rec_l)
        assert rel < 1e-9, rel

    def test_auto_falls_back_on_three_term(self):
        from morfem_tpu import morfem

        key = jax.random.PRNGKey(1)
        domain, a0, a1, a2, b = random_affine_system(key, n=48, m=2, num_points=12)
        x, q, *_ = morfem(
            np.asarray(domain), np.asarray(a0), np.asarray(a1),
            np.asarray(a2), np.asarray(b),
            config=CFG.replace(sweep_method="auto"),
        )
        assert np.isfinite(np.asarray(x)).all()

    def test_spectral_required_raises_on_three_term(self):
        from morfem_tpu import morfem

        key = jax.random.PRNGKey(1)
        domain, a0, a1, a2, b = random_affine_system(key, n=48, m=2, num_points=12)
        with pytest.raises(ValueError, match="two-term"):
            morfem(
                np.asarray(domain), np.asarray(a0), np.asarray(a1),
                np.asarray(a2), np.asarray(b),
                config=CFG.replace(sweep_method="spectral"),
            )


class TestComplexCoefficients:
    def test_morfem_with_complex_coefficient(self):
        """Coefficient callables may return complex values (the estimator
        keeps the reference's unconjugated products); the pipeline must
        produce solutions matching a per-point oracle."""
        from morfem_tpu import morfem
        import oracles

        rng = np.random.default_rng(5)
        n, m = 40, 2
        a0 = rng.normal(size=(n, n)) / n + np.eye(n) * 40
        a0 = (a0 + a0.T) / 2
        a1 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
        a2 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
        b = rng.normal(size=(n, m))
        domain = np.linspace(1.0, 2.0, 12)
        t_b = lambda t: t * (1.0 + 0.5j)  # noqa: E731
        x, q, *_ = morfem(
            domain, a0, a1, a2, b, t_b=t_b,
            config=CFG.replace(error_threshold=1e-12, sweep_method="lu"),
        )
        rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
        ref = oracles.full_sweep(
            domain, a0, a1, a2, b,
            lambda t: 1.0, lambda t: t, lambda t: t**2, t_b,
        )
        rel = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
        # complex-symmetric (bilinear) Galerkin has a weaker quasi-
        # optimality constant than the real SPD case; 2-3e-8 observed
        assert rel < 1e-7, rel


class TestSpectralGuards:
    """ADVICE r1 regressions: complex or unsymmetrized-nonsymmetric reduced
    models must make `prepare_spectral*` raise, so `_run_sweep`'s "auto"
    dispatch falls back to the batched-LU sweep instead of silently
    computing a wrong (real-part-only / force-symmetrized) answer."""

    def _complex_parts(self):
        rng = np.random.default_rng(5)
        n, m = 40, 2
        a0 = rng.normal(size=(n, n)) / n + np.eye(n) * 40
        a0 = (a0 + a0.T) / 2
        a1 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
        a2 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
        b = rng.normal(size=(n, m))
        domain = np.linspace(1.0, 2.0, 12)
        t_b = lambda t: t * (1.0 + 0.5j)  # noqa: E731
        return domain, a0, a1, a2, b, t_b

    def test_complex_system_auto_matches_lu(self):
        from morfem_tpu import morfem

        domain, a0, a1, a2, b, t_b = self._complex_parts()
        cfg = CFG.replace(error_threshold=1e-12)
        x_auto, *_ = morfem(
            domain, a0, a1, a2, b, t_b=t_b,
            config=cfg.replace(sweep_method="auto"),
        )
        x_lu, *_ = morfem(
            domain, a0, a1, a2, b, t_b=t_b,
            config=cfg.replace(sweep_method="lu"),
        )
        np.testing.assert_allclose(
            np.asarray(x_auto), np.asarray(x_lu), rtol=1e-12, atol=1e-14
        )

    def test_prepare_rejects_complex(self):
        from morfem_tpu.mor.reduced import ReducedModel
        from morfem_tpu.mor.spectral import prepare_spectral_quadratic

        k = 6
        rng = np.random.default_rng(3)
        r = rng.normal(size=(k, k))
        rm = ReducedModel(
            domain=jnp.linspace(1.0, 2.0, 8),
            q=jnp.eye(k, dtype=jnp.complex128),
            r0=jnp.asarray(r @ r.T + np.eye(k), jnp.complex128),
            r1=jnp.zeros((k, k), jnp.complex128),
            r2=jnp.asarray(np.eye(k), jnp.complex128),
            b_r=jnp.asarray(rng.normal(size=(k, 2)) + 1j, jnp.complex128),
            ncols=jnp.asarray(k),
            t_a0=lambda t: jnp.ones_like(t), t_a1=lambda t: t,
            t_a2=lambda t: t**2, t_b=lambda t: t,
        )
        with pytest.raises(ValueError, match="real systems only"):
            prepare_spectral(rm, CFG)
        with pytest.raises(ValueError, match="real systems only"):
            prepare_spectral_quadratic(rm, CFG)

    def test_unsymmetrized_nonsymmetric_rejected(self):
        """With config.symmetrize=False, a non-symmetric reduced operator
        must be rejected (the spectral prepare always symmetrizes, which
        would silently disagree with the LU sweep)."""
        from morfem_tpu.mor.reduced import ReducedModel

        rng = np.random.default_rng(7)
        k = 8
        r0 = rng.normal(size=(k, k)) + np.eye(k) * 8  # NOT symmetric
        r2 = np.eye(k)
        rm = ReducedModel(
            domain=jnp.linspace(0.0, 0.4, 10),
            q=jnp.eye(k), r0=jnp.asarray(r0),
            r1=jnp.zeros((k, k)), r2=jnp.asarray(r2),
            b_r=jnp.asarray(rng.normal(size=(k, 2))),
            ncols=jnp.asarray(k),
            t_a0=lambda t: jnp.ones_like(t), t_a1=lambda t: t,
            t_a2=lambda t: t**2, t_b=lambda t: jnp.ones_like(t),
        )
        cfg = CFG.replace(symmetrize=False)
        with pytest.raises(ValueError, match="not numerically symmetric"):
            prepare_spectral(rm, cfg)
        # symmetrize=True (default) keeps the spectral path available
        sm = prepare_spectral(rm, CFG)
        assert np.isfinite(np.asarray(spectral_sweep(sm))).all()

    def test_unsymmetrized_auto_matches_lu_end_to_end(self):
        from morfem_tpu import morfem

        rng = np.random.default_rng(11)
        n, m = 32, 2
        a0 = rng.normal(size=(n, n)) / n + np.eye(n) * 30  # non-symmetric
        a2 = rng.normal(size=(n, n)) / n  # non-symmetric
        a1 = np.zeros((n, n))
        b = rng.normal(size=(n, m))
        domain = np.linspace(1.0, 2.0, 10)
        cfg = CFG.replace(symmetrize=False, error_threshold=1e-12)
        x_auto, *_ = morfem(
            domain, a0, a1, a2, b, config=cfg.replace(sweep_method="auto")
        )
        x_lu, *_ = morfem(
            domain, a0, a1, a2, b, config=cfg.replace(sweep_method="lu")
        )
        np.testing.assert_allclose(
            np.asarray(x_auto), np.asarray(x_lu), rtol=1e-12, atol=1e-14
        )


class TestQuadraticSpectral:
    def _three_term_system(self, n=48, i_pts=20):
        key = jax.random.PRNGKey(9)
        domain, a0, a1, a2, b = random_affine_system(
            key, n=n, m=2, num_points=i_pts
        )
        return AffineSystem.create(domain, a0, a1, a2, b)

    def test_matches_lu_sweep(self):
        from morfem_tpu import equally_distributed_basis, project
        from morfem_tpu.mor.spectral import (
            prepare_spectral_quadratic,
            spectral_sweep_quadratic,
        )

        sys_ = self._three_term_system()
        q = equally_distributed_basis(sys_, CFG, count=6)
        rm = project(sys_, q)
        sm = prepare_spectral_quadratic(rm, CFG)
        x_spec = spectral_sweep_quadratic(sm)
        x_lu = sweep(rm, CFG)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-9, rel

    def test_padded_model(self):
        from morfem_tpu import build_reduced_model
        from morfem_tpu.mor.spectral import (
            prepare_spectral_quadratic,
            spectral_sweep_quadratic,
        )

        sys_ = self._three_term_system()
        rm, _ = build_reduced_model(sys_, CFG.replace(error_threshold=1e-10))
        sm = prepare_spectral_quadratic(rm, CFG)  # padded rm
        x_spec = spectral_sweep_quadratic(sm)
        x_lu = sweep(rm, CFG)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-9, rel

    def test_regrid(self):
        from morfem_tpu import equally_distributed_basis, project
        from morfem_tpu.mor.spectral import (
            prepare_spectral_quadratic,
            spectral_sweep_quadratic,
        )

        sys_ = self._three_term_system()
        q = equally_distributed_basis(sys_, CFG, count=6)
        rm = project(sys_, q)
        sm = prepare_spectral_quadratic(rm, CFG)
        dense = jnp.linspace(3.1, 4.9, 333)
        x_spec = spectral_sweep_quadratic(sm, dense)
        x_lu = sweep(rm, CFG, ts=dense)
        rel = np.linalg.norm(np.asarray(x_spec - x_lu)) / np.linalg.norm(
            np.asarray(x_lu)
        )
        assert rel < 1e-9, rel

    def test_rejects_non_wave_form(self):
        from morfem_tpu import equally_distributed_basis, project
        from morfem_tpu.mor.spectral import prepare_spectral_quadratic

        key = jax.random.PRNGKey(10)
        domain, a0, a1, a2, b = random_affine_system(key, n=24, m=1, num_points=8)
        sys_ = AffineSystem.create(
            domain, a0, a1, a2, b, t_a2=lambda t: t**3
        )
        q = equally_distributed_basis(sys_, CFG, count=3)
        rm = project(sys_, q)
        with pytest.raises(ValueError, match="t_a2"):
            prepare_spectral_quadratic(rm, CFG)


class TestFullOrderSpectral:
    """Full-order (K = N) spectral sweep — ops/spectral_solve.py."""

    def test_matches_lu_sweep_and_custom_grid(self):
        import dataclasses

        from morfem_tpu.config import DEFAULT_CONFIG as cfg
        from morfem_tpu.ops.solve import solve_sweep
        from morfem_tpu.ops.spectral_solve import prepare_spectral_full
        from morfem_tpu.system import AffineSystem
        from morfem_tpu.utils.synthetic import waveguide_like_system

        domain, c, g, b = waveguide_like_system(
            jax.random.PRNGKey(0), n=192, num_points=30
        )
        sys_ = AffineSystem.create(
            domain, c, np.zeros_like(np.asarray(c)), g, b
        )
        fs = prepare_spectral_full(sys_, cfg)
        xs = fs.sweep()
        oracle = solve_sweep(sys_, cfg)
        rel = float(jnp.linalg.norm(xs - oracle) / jnp.linalg.norm(oracle))
        assert rel < 1e-10, rel
        ts = jnp.linspace(3.2e9, 4.8e9, 17)
        xs2 = fs.sweep(ts)
        o2 = solve_sweep(dataclasses.replace(sys_, domain=ts), cfg)
        rel2 = float(jnp.linalg.norm(xs2 - o2) / jnp.linalg.norm(o2))
        assert rel2 < 1e-10, rel2

    def test_rejects_three_term_and_complex(self):
        import dataclasses

        import pytest

        from morfem_tpu.config import DEFAULT_CONFIG as cfg
        from morfem_tpu.ops.spectral_solve import prepare_spectral_full
        from morfem_tpu.system import AffineSystem
        from morfem_tpu.utils.synthetic import waveguide_like_system

        domain, c, g, b = waveguide_like_system(
            jax.random.PRNGKey(1), n=64, num_points=8
        )
        sys_ = AffineSystem.create(
            domain, c, np.zeros_like(np.asarray(c)), g, b
        )
        with pytest.raises(ValueError):
            prepare_spectral_full(
                dataclasses.replace(sys_, a1=jnp.eye(64, dtype=jnp.float64)),
                cfg,
            )
        with pytest.raises(ValueError):
            prepare_spectral_full(
                dataclasses.replace(
                    sys_, b=sys_.b.astype(jnp.complex128)
                ),
                cfg,
            )
