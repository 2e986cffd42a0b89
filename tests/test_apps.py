"""Tests for the waveguide application layer and the parameter studies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import MorfemConfig
from morfem_tpu.apps.studies import (
    basis_size_study,
    upscale_block_diag,
    upscale_interpolate,
)
from morfem_tpu.apps.waveguide import (
    KTE_DEFAULT,
    b_coefficient,
    calibrate_port_amplitude,
    full_order_gsm,
    generalized_scattering_matrix,
    load_waveguide_data,
    mor_gsm,
    synthesize_waveguide,
    waveguide_system,
)
from morfem_tpu.ops.solve import solve_sweep

CFG = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)


@pytest.fixture(scope="module")
def wg():
    data = load_waveguide_data(n_fallback=192)
    freq = np.linspace(3e9, 5e9, 60)
    return data, freq, waveguide_system(freq, data)


class TestWaveguidePhysics:
    def test_b_coefficient_matches_reference_formula(self):
        """reference test_helpers.py:70-72"""
        import math
        from scipy.constants import pi, c as c_light

        for f in (3e9, 4.2e9, 5e9):
            expected = math.sqrt(
                math.sqrt(((2 * pi * f) / c_light) ** 2 - KTE_DEFAULT**2) / f
            )
            got = float(b_coefficient(jnp.asarray(f)))
            assert abs(got - expected) / expected < 1e-12

    def test_gsm_matches_reference_formula(self):
        """gim = j·2πf·ε0·EᵀB; gam = gim⁻¹; gsm = 2(I+gam)⁻¹ − I
        (reference test_helpers.py:9-14)"""
        from scipy.constants import pi, epsilon_0

        rng = np.random.default_rng(0)
        f = 4e9
        e = rng.normal(size=(50, 2))
        b = rng.normal(size=(50, 2))
        gim = 1j * 2 * pi * f * epsilon_0 * e.T @ b
        gam = np.linalg.inv(gim)
        expected = 2 * np.linalg.inv(np.eye(2) + gam) - np.eye(2)
        got = np.asarray(generalized_scattering_matrix(jnp.asarray(f), e, b))
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_gsm_batched_equals_per_point(self):
        rng = np.random.default_rng(1)
        freqs = np.linspace(3e9, 5e9, 7)
        e = rng.normal(size=(7, 30, 2))
        b = rng.normal(size=(7, 30, 2))
        batched = np.asarray(
            generalized_scattering_matrix(jnp.asarray(freqs), e, b)
        )
        for i, f in enumerate(freqs):
            single = np.asarray(
                generalized_scattering_matrix(jnp.asarray(f), e[i], b[i])
            )
            np.testing.assert_allclose(batched[i], single, rtol=1e-12)

    def test_gsm_unitarity(self, wg):
        """The lossless waveguide's scattering matrix must be unitary."""
        data, freq, sys_ = wg
        gsm = np.asarray(full_order_gsm(sys_, CFG))
        prod = np.einsum("imk,imn->ikn", gsm.conj(), gsm)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(2), prod.shape), atol=1e-8
        )

    def test_synthetic_has_inband_resonances(self, wg):
        """S-parameters must show real dispersion, not a degenerate S≈−I."""
        data, freq, sys_ = wg
        gsm = np.asarray(full_order_gsm(sys_, CFG))
        s11_db = 20 * np.log10(np.abs(gsm[:, 0, 0]) + 1e-300)
        s21_db = 20 * np.log10(np.abs(gsm[:, 1, 0]) + 1e-300)
        assert s11_db.min() < -10  # strong transmission somewhere
        assert s21_db.max() > -3  # near-full transmission somewhere
        assert s21_db.min() < -10  # and rejection elsewhere


class TestWaveguideMOR:
    def test_mor_gsm_matches_full_order(self, wg):
        """The reference's acceptance comparison (main.py:39-68)."""
        data, freq, sys_ = wg
        gsm_ref = np.asarray(full_order_gsm(sys_, CFG))
        gsm_mor, rm, greedy = mor_gsm(sys_, CFG.replace(error_threshold=1e-10))
        err = np.linalg.norm(np.asarray(gsm_mor) - gsm_ref, axis=(1, 2))
        assert err.max() < 1e-8, err.max()
        assert rm.q.shape[1] < sys_.n // 2  # it actually reduced

    def test_loader_cache_roundtrip(self, tmp_path):
        d1 = load_waveguide_data(n_fallback=96, cache_dir=str(tmp_path))
        d2 = load_waveguide_data(n_fallback=96, cache_dir=str(tmp_path))
        np.testing.assert_array_equal(d1.c_mat, d2.c_mat)
        np.testing.assert_array_equal(d1.wp, d2.wp)
        assert d1.synthetic

    def test_loader_reads_reference_layout(self, tmp_path):
        """Compatible with the reference data/ directory layout
        (main.py:21-23): Ct.npy, Tt.npy, WP.npy, kTE1.npy."""
        rng = np.random.default_rng(0)
        n = 24
        np.save(tmp_path / "Ct.npy", rng.normal(size=(n, n)))
        np.save(tmp_path / "Tt.npy", rng.normal(size=(n, n)))
        np.save(tmp_path / "WP.npy", rng.normal(size=(n, 2)))
        np.save(tmp_path / "kTE1.npy", np.asarray([[54.5976295582387]]))
        d = load_waveguide_data(data_dir=str(tmp_path))
        assert not d.synthetic
        assert d.c_mat.shape == (n, n)
        assert d.kte == pytest.approx(54.5976295582387)


class TestStudies:
    def test_basis_size_study_monotone_error(self, wg):
        data, freq, sys_ = wg
        x_full = solve_sweep(sys_, CFG)
        study = basis_size_study(sys_, [3, 6, 12, 24], CFG, x_full=x_full)
        assert study.rel_error.shape == (4,)
        # more seeds → error must not get (much) worse; largest ≪ smallest
        assert study.rel_error[-1] < study.rel_error[0] * 1e-2
        assert study.rel_error[-1] < 1e-7

    def test_study_matches_single_size_path(self, wg):
        """The batched masked path must agree with the standalone
        equally-distributed basis builder."""
        from morfem_tpu import equally_distributed_basis, project, sweep

        data, freq, sys_ = wg
        x_full = solve_sweep(sys_, CFG)
        study = basis_size_study(sys_, [5, 9], CFG, x_full=x_full)
        for si, count in enumerate([5, 9]):
            q = equally_distributed_basis(sys_, CFG, count=count)
            rm = project(sys_, q)
            x = sweep(rm, CFG)
            rec_single = np.einsum(
                "nk,ikm->inm", np.asarray(q), np.asarray(x)
            )
            nc = int(study.ncols[si])
            rec_batch = np.einsum(
                "nk,ikm->inm",
                np.asarray(study.q[si])[:, :nc],
                np.asarray(study.x[si])[:, :nc],
            )
            np.testing.assert_allclose(rec_single, rec_batch, atol=1e-8)

    def test_upscale_block_diag(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(8, 8))
        c = rng.normal(size=(8, 8))
        b = rng.normal(size=(8, 2))
        (a_big, c_big), b_big = upscale_block_diag([a, c], b, rate=3)
        assert a_big.shape == (24, 24)
        np.testing.assert_array_equal(a_big[8:16, 8:16], a)
        np.testing.assert_array_equal(a_big[:8, 8:16], 0)
        # each operator tiles ITSELF (the reference tiled C into Γ's slot)
        np.testing.assert_array_equal(c_big[16:, 16:], c)
        np.testing.assert_array_equal(b_big, np.tile(b, (3, 1)))

    def test_upscale_interpolate(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(16, 16))
        a = (a + a.T) / 2
        big = upscale_interpolate(a, 2.0)
        assert big.shape == (32, 32)
        np.testing.assert_allclose(big, big.T)
