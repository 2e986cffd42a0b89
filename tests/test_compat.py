"""Tests for the reference-compatible API surface and data tooling."""

import io
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu import MorfemConfig
from morfem_tpu.compat import (
    ModelDefinition,
    TimeStatistics,
    morfem,
    solve_finite_element_method,
)
from morfem_tpu.utils.data_convert import convert_csv_dir, convert_csv_file

import oracles

CFG = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(3)
    n, m, i = 40, 2, 16
    a0 = rng.normal(size=(n, n)) / n + np.eye(n) * 30
    a0 = (a0 + a0.T) / 2
    a1 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
    a2 = (lambda a: (a + a.T) / 2)(rng.normal(size=(n, n)) / n)
    b = rng.normal(size=(n, m))
    domain = np.linspace(3.0, 5.0, i)
    return domain, a0, a1, a2, b


class TestCompat:
    def test_morfem_reference_contract(self, small):
        """Same call shape as reference implementation.py:99-186, sparse in."""
        domain, a0, a1, a2, b = small
        x, q, r0, r1, r2, b_r = morfem(
            domain, sp.csc_array(a0), sp.csc_array(a1), sp.csc_array(a2),
            sp.csc_array(b), config=CFG,
        )
        assert isinstance(x, np.ndarray)
        nr = q.shape[1]
        assert x.shape == (len(domain), nr, 2)
        np.testing.assert_allclose(r0, q.T @ a0 @ q, atol=1e-10)

    def test_equivalent_call_form_with_zero_slot(self, small):
        """docs/source/index.rst:52-62 style: (G − t²C)X = tB."""
        domain, a0, a1, a2, b = small
        zero = sp.csc_array(a0.shape)
        x, q, g_r, _, c_r, b_r = morfem(
            domain, a0, zero, a2, b, t_a2=lambda t: -(t**2),
            config=CFG.replace(error_threshold=1e-12),
        )
        rec = np.einsum("nk,ikm->inm", q, x)
        ref = oracles.full_sweep(
            domain, a0, np.zeros_like(a0), a2, b,
            lambda t: 1.0, lambda t: t, lambda t: -(t**2), lambda t: t,
        )
        rel = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
        assert rel < 1e-6

    def test_model_definition_and_full_sweep(self, small):
        domain, a0, a1, a2, b = small
        md = ModelDefinition(domain, a0, a1, a2, b)
        x = solve_finite_element_method(md, CFG)
        ref = oracles.full_sweep(
            domain, a0, a1, a2, b, *oracles.default_wave_coeffs()
        )
        np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-12)

    def test_time_statistics_api(self, capsys):
        ts = TimeStatistics()
        ts.start_clock()
        ts.add_time("Offline")
        ts.add_custom_time("Whole", ts.clock)
        ts.print_statistics()
        out = capsys.readouterr().out
        assert "Whole:" in out and "Offline:" in out
        # per-instance state (the reference shared a class-level dict)
        ts2 = TimeStatistics()
        assert "Offline" not in ts2.times


class TestDataConvert:
    def test_csv_roundtrip(self, tmp_path):
        src = tmp_path / "csv"
        dst = tmp_path / "npy"
        src.mkdir()
        mat = np.arange(12.0).reshape(3, 4)
        np.savetxt(src / "Ct.csv", mat, delimiter=",")
        scalar = np.asarray([[54.5976295582387]])
        np.savetxt(src / "kTE1.csv", scalar, delimiter=",")
        results = convert_csv_dir(str(src), str(dst))
        assert results == {"Ct": (3, 4), "kTE1": (1, 1)}
        np.testing.assert_allclose(np.load(dst / "Ct.npy"), mat)

    def test_single_file(self, tmp_path):
        src = tmp_path / "WP.csv"
        np.savetxt(src, np.ones((5, 2)), delimiter=",")
        out = convert_csv_file(str(src), str(tmp_path / "WP.npy"))
        assert out.shape == (5, 2)


class TestGramUtilities:
    def test_expand_gram_matrix(self):
        from morfem_tpu.ops.gram import expand_gram_matrix, hermitian
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        n, k1, k2 = 30, 4, 2
        q_old = np.linalg.qr(rng.normal(size=(n, k1)))[0]
        q_new = rng.normal(size=(n, k2))
        mid = rng.normal(size=(n, n))
        original = q_old.conj().T @ mid @ q_old
        grown = expand_gram_matrix(
            jnp.asarray(original), jnp.asarray(q_old), jnp.asarray(mid),
            jnp.asarray(q_new),
        )
        q_full = np.concatenate([q_old, q_new], axis=1)
        expected = q_full.conj().T @ mid @ q_full
        np.testing.assert_allclose(np.asarray(grown), expected, rtol=1e-10)

    def test_hermitian_guard(self):
        from morfem_tpu.ops.gram import hermitian
        import jax.numpy as jnp

        with pytest.raises(ValueError):
            hermitian(jnp.ones(3))
        a = jnp.asarray([[1 + 2j, 3.0], [0.0, 4 - 1j]])
        np.testing.assert_allclose(
            np.asarray(hermitian(a)), np.asarray(a).conj().T
        )

    def test_equally_distributed_points(self):
        from morfem_tpu.apps.waveguide import equally_distributed_points
        import jax.numpy as jnp

        src = jnp.linspace(0.0, 1.0, 11)
        out = equally_distributed_points(src, 3)
        np.testing.assert_allclose(np.asarray(out), [0.0, 0.5, 1.0])
        with pytest.raises(ValueError):
            equally_distributed_points(src, 50)
