"""Fused multi-word bf16 GEMM kernel (interpret mode on CPU).

The on-chip counterpart is exercised by tools/onchip_smoke.py and the
panel-LU paths of bench.py; here we pin the numerics contract: f32-true
accuracy vs an f64 oracle, parity class with `matmul_f32_accurate`, the
addend/sign forms, and the shape gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu.ops.pallas.fused_mm import fusable, mm_words
from morfem_tpu.ops.precision import matmul_f32_accurate


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(7)
    g, m, k, n = 2, 256, 128, 384
    c = jnp.asarray(rng.standard_normal((g, m, k)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((g, k, n)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g, m, n)), jnp.float32)
    oracle = np.einsum(
        "gmk,gkn->gmn", np.asarray(c, np.float64), np.asarray(r, np.float64)
    )
    return c, r, t, oracle


def test_mm_words_f32_true(mats):
    c, r, t, oracle = mats
    out = mm_words(c, r, None, interpret=True)
    rel = np.abs(np.asarray(out, np.float64) - oracle).max()
    rel /= np.abs(oracle).max()
    assert rel < 5e-7  # f32-native grade (bf16 1-pass would be ~2e-3)


def test_mm_words_addend_and_sign(mats):
    c, r, t, oracle = mats
    out = mm_words(c, r, t, sign=-1, interpret=True)
    want = np.asarray(t, np.float64) - oracle
    rel = np.abs(np.asarray(out, np.float64) - want).max()
    rel /= np.abs(oracle).max()
    assert rel < 5e-7
    neg = mm_words(c, r, None, sign=-1, interpret=True)
    pos = mm_words(c, r, None, interpret=True)
    np.testing.assert_array_equal(np.asarray(neg), -np.asarray(pos))


def test_mm_words_matches_xla_scheme(mats):
    c, r, t, oracle = mats
    out = mm_words(c, r, None, interpret=True)
    ref = matmul_f32_accurate(c, r)
    # truncation vs round-to-nearest word splits: same accuracy class
    scale = np.abs(oracle).max()
    assert float(jnp.abs(out - ref).max()) / scale < 1e-6


def test_fusable_gate():
    if jax.default_backend() != "cpu":
        pytest.skip("gate's False branch only observable off-TPU; the "
                    "True branch is asserted in tools/onchip_smoke.py")
    assert not fusable(256, 128, 384)


def test_mm_words_nan_propagates(mats):
    c, r, _, _ = mats
    c_nan = c.at[0, 0, 0].set(jnp.nan)
    out = mm_words(c_nan, r, None, interpret=True)
    assert np.isnan(np.asarray(out[0, 0])).all()  # whole affected row
    assert np.isfinite(np.asarray(out[1])).all()  # other batch untouched


def test_mm_words_bad_shapes():
    c = jnp.zeros((1, 200, 128), jnp.float32)  # M not 128-divisible
    r = jnp.zeros((1, 128, 256), jnp.float32)
    with pytest.raises(ValueError):
        mm_words(c, r, None, interpret=True)
    with pytest.raises(ValueError):
        mm_words(
            jnp.zeros((1, 256, 128), jnp.float32),
            jnp.zeros((2, 128, 256), jnp.float32),  # G mismatch
            None,
            interpret=True,
        )
    with pytest.raises(ValueError):  # K not a lane multiple
        mm_words(
            jnp.zeros((1, 256, 100), jnp.float32),
            jnp.zeros((1, 100, 256), jnp.float32),
            None,
            interpret=True,
        )
    with pytest.raises(ValueError):  # addend layout mismatch
        mm_words(
            jnp.zeros((1, 256, 128), jnp.float32),
            jnp.zeros((1, 128, 256), jnp.float32),
            jnp.zeros((1, 256, 256), jnp.float32).reshape(256, 1, 256),
            interpret=True,
        )
