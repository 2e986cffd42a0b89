"""Blocked panel-LU factorization (ops/panel_lu.py + the Pallas kernel).

Run in interpret mode on CPU (the Mosaic path is exercised on-chip by
bench.py and tools/onchip_smoke.py). Oracles: NumPy LU solves.
Reference role: implementation.py:468-480 (splu / lu_factor).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu.config import MorfemConfig
from morfem_tpu.ops.panel_lu import (
    panel_lu_apply,
    panel_lu_factor,
    solve_batch_panel,
    solve_sweep_panel,
)


@pytest.mark.parametrize("n", [64, 128, 200, 384])
def test_factor_apply_f32_quality(n):
    # own deterministic rng: the session rng's draw position depends on
    # which tests ran before, and this f32-quality bound is conditioning-
    # sensitive — a shared stream made it order-flaky (round 5)
    rng = np.random.default_rng(1234 + n)
    g = 2
    a = rng.standard_normal((g, n, n))
    b = rng.standard_normal((g, n, 3))
    f = panel_lu_factor(jnp.asarray(a), interpret=True)
    x = np.asarray(panel_lu_apply(f, jnp.asarray(b)), np.float64)
    relres = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    # f32 factorization quality is cond·ε_f32-class BY CONTRACT (callers
    # refine in f64) — bound against the drawn batch's conditioning, not
    # a fixed constant (gaussian draws occasionally land cond ~1e5)
    cond = max(np.linalg.cond(a[i]) for i in range(g))
    assert relres < 100 * cond * np.finfo(np.float32).eps, (relres, cond)


def test_refined_solve_reaches_working_precision(rng):
    n, g = 300, 3
    a = rng.standard_normal((g, n, n))
    a[0] = (a[0] + a[0].T) / 2  # symmetric indefinite lane
    b = rng.standard_normal((g, n, 2))
    x = solve_batch_panel(
        jnp.asarray(a), jnp.asarray(b),
        MorfemConfig(refine_iterations=8), interpret=True,
    )
    relres = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
    assert relres < 1e-12


def test_matches_numpy_solve(rng):
    n = 160
    a = rng.standard_normal((1, n, n)) + 4.0 * np.eye(n)
    b = rng.standard_normal((1, n, 2))
    x = solve_batch_panel(
        jnp.asarray(a), jnp.asarray(b),
        MorfemConfig(refine_iterations=8), interpret=True,
    )
    x_np = np.linalg.solve(a, b)
    assert np.linalg.norm(np.asarray(x) - x_np) / np.linalg.norm(x_np) < 1e-11


def test_pivoting_handles_zero_leading_entry(rng):
    # a00 = 0 forces a pivot exchange at the very first column
    n = 96
    a = rng.standard_normal((1, n, n))
    a[0, 0, 0] = 0.0
    b = rng.standard_normal((1, n, 1))
    x = solve_batch_panel(
        jnp.asarray(a), jnp.asarray(b),
        MorfemConfig(refine_iterations=8), interpret=True,
    )
    relres = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
    assert relres < 1e-12


def test_row_scale_robustness(rng):
    # badly row-scaled system: equilibration must keep pivots O(1)
    n = 128
    a = rng.standard_normal((1, n, n))
    scales = 10.0 ** rng.uniform(-6, 6, size=n)
    a = a * scales[None, :, None]
    b = rng.standard_normal((1, n, 2)) * scales[None, :, None]
    x = solve_batch_panel(
        jnp.asarray(a), jnp.asarray(b),
        MorfemConfig(refine_iterations=10), interpret=True,
    )
    relres = np.linalg.norm(
        (a @ np.asarray(x) - b) / scales[None, :, None]
    ) / np.linalg.norm(b / scales[None, :, None])
    assert relres < 1e-11


def test_sweep_panel_matches_lu_sweep(rng):
    from morfem_tpu.ops.solve import solve_sweep
    from morfem_tpu.system import AffineSystem
    from morfem_tpu.utils.synthetic import random_affine_system

    domain, a0, a1, a2, b = random_affine_system(
        jax.random.PRNGKey(5), n=200, m=2, num_points=13
    )
    sys_ = AffineSystem.create(domain, a0, a1, a2, b)
    cfg_lu = MorfemConfig(factorization="lu", solve_chunk=4)
    cfg_panel = MorfemConfig(factorization="panel", solve_chunk=4)
    x_lu = solve_sweep(sys_, cfg_lu)
    x_panel = solve_sweep(sys_, cfg_panel)
    rel = float(jnp.linalg.norm(x_panel - x_lu) / jnp.linalg.norm(x_lu))
    assert rel < 1e-10
    assert x_panel.shape == x_lu.shape


def test_sweep_panel_nondivisible_chunk(rng):
    from morfem_tpu.system import AffineSystem
    from morfem_tpu.utils.synthetic import random_affine_system

    domain, a0, a1, a2, b = random_affine_system(
        jax.random.PRNGKey(6), n=96, m=2, num_points=7
    )
    sys_ = AffineSystem.create(domain, a0, a1, a2, b)
    x = solve_sweep_panel(sys_, MorfemConfig(solve_chunk=4))
    assert x.shape == (7, 96, 2)
    assert bool(jnp.isfinite(x).all())


@pytest.mark.parametrize("n", [128, 200, 384])
def test_block_pivot_factor_apply_quality(rng, n):
    from morfem_tpu.ops.panel_lu import panel_lu_factor_block

    g = 2
    a = rng.standard_normal((g, n, n))
    a[1] = (a[1] + a[1].T) / 2  # symmetric indefinite lane
    b = rng.standard_normal((g, n, 3))
    f = panel_lu_factor_block(jnp.asarray(a), interpret=True)
    x = np.asarray(panel_lu_apply(f, jnp.asarray(b)), np.float64)
    relres = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    # block pivoting's growth factor exceeds partial pivoting's — the raw
    # factor is f32-grade up to that growth; the refinement tests below
    # and the sweep's escalation are the real contract
    assert relres < 1e-1
    # and refinement with this factor must still converge to f64
    a64, b64 = jnp.asarray(a), jnp.asarray(b)
    xr = panel_lu_apply(f, b64).astype(jnp.float64)
    for _ in range(10):
        xr = xr + panel_lu_apply(f, b64 - a64 @ xr).astype(jnp.float64)
    relres_r = np.linalg.norm(a @ np.asarray(xr) - b) / np.linalg.norm(b)
    assert relres_r < 1e-12


def test_block_pivot_refines_to_f64(rng):
    from morfem_tpu.ops.panel_lu import panel_lu_factor_block

    n, g = 300, 2
    a = rng.standard_normal((g, n, n))
    b = rng.standard_normal((g, n, 2))
    f = panel_lu_factor_block(jnp.asarray(a), interpret=True)
    a64 = jnp.asarray(a)
    b64 = jnp.asarray(b)
    x = panel_lu_apply(f, b64).astype(jnp.float64)
    for _ in range(8):
        r = b64 - a64 @ x
        x = x + panel_lu_apply(f, r).astype(jnp.float64)
    relres = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
    assert relres < 1e-12


def test_sweep_block_pivot_with_escalation(rng):
    """panel_pivot="block" end-to-end: results must match the full-pivot
    sweep to refinement precision (escalation covers hard chunks)."""
    from morfem_tpu.system import AffineSystem
    from morfem_tpu.utils.synthetic import random_affine_system

    parts = random_affine_system(
        jax.random.PRNGKey(5), n=200, m=2, num_points=6
    )
    sys_ = AffineSystem.create(*parts)
    cfg_full = MorfemConfig(factorization="panel", solve_chunk=3)
    cfg_blk = MorfemConfig(
        factorization="panel", solve_chunk=3, panel_pivot="block"
    )
    x_full = solve_sweep_panel(sys_, cfg_full)
    x_blk = solve_sweep_panel(sys_, cfg_blk)
    rel = float(
        jnp.linalg.norm(x_blk - x_full) / jnp.linalg.norm(x_full)
    )
    assert rel < 1e-9


def test_fast_trail_factor_refines_to_working_precision(rng):
    # trail="f32x3" (HIGH trailing updates + 2-word pivot extraction):
    # looser factor, but refinement must still reach f64 precision
    n, g = 300, 2
    a = rng.standard_normal((g, n, n))
    b = rng.standard_normal((g, n, 2))
    f = panel_lu_factor(jnp.asarray(a), interpret=True, trail="f32x3")
    x = panel_lu_apply(f, jnp.asarray(b)).astype(jnp.float64)
    a64 = jnp.asarray(a)
    b64 = jnp.asarray(b)
    for _ in range(10):
        r = b64 - a64 @ x
        x = x + panel_lu_apply(f, r).astype(jnp.float64)
    relres = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
    assert relres < 1e-12


@pytest.mark.parametrize("panel", [256, 384])
def test_wide_panel_factor_apply(rng, panel):
    """panel_width > 128 (fewer sequential panel steps): both factor
    variants must produce refinable factors at non-divisible N."""
    from morfem_tpu.ops.panel_lu import panel_lu_factor_block

    n, g = 300, 2
    a = rng.standard_normal((g, n, n))
    b = rng.standard_normal((g, n, 2))
    a64, b64 = jnp.asarray(a), jnp.asarray(b)
    for factor in (panel_lu_factor, panel_lu_factor_block):
        f = factor(a64, interpret=True, panel=panel)
        x = panel_lu_apply(f, b64).astype(jnp.float64)
        for _ in range(8):
            x = x + panel_lu_apply(f, b64 - a64 @ x).astype(jnp.float64)
        relres = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
        assert relres < 1e-12, factor.__name__


def test_sweep_panel_width_config(rng):
    from morfem_tpu.ops.solve import solve_sweep
    from morfem_tpu.system import AffineSystem
    from morfem_tpu.utils.synthetic import random_affine_system

    domain, a0, a1, a2, b = random_affine_system(
        jax.random.PRNGKey(7), n=200, m=2, num_points=5
    )
    sys_ = AffineSystem.create(domain, a0, a1, a2, b)
    x_lu = solve_sweep(sys_, MorfemConfig(factorization="lu"))
    x_wide = solve_sweep_panel(
        sys_, MorfemConfig(solve_chunk=3, panel_width=256)
    )
    rel = float(jnp.linalg.norm(x_wide - x_lu) / jnp.linalg.norm(x_lu))
    assert rel < 1e-10


def test_config_rejects_bad_panel_width():
    with pytest.raises(ValueError, match="panel_width"):
        MorfemConfig(panel_width=192)


def test_full_pivot_panel_vmem_clamp():
    """Wide panels fall back to 128 for the full-pivot kernel when its
    P×N VMEM buffers would not fit; small N keeps the requested width."""
    from morfem_tpu.ops.panel_lu import full_pivot_panel

    assert full_pivot_panel(1536, 256) == 256
    assert full_pivot_panel(3411, 256) == 128
    assert full_pivot_panel(3411, 128) == 128
    # the clamp engages exactly where 5*P*Npl*4 crosses 12 MiB
    assert full_pivot_panel(2304, 256) == 256
    assert full_pivot_panel(2305, 256) == 128


def test_factor_rejects_unknown_trail(rng):
    a = jnp.asarray(rng.standard_normal((1, 64, 64)))
    with pytest.raises(ValueError, match="trail"):
        panel_lu_factor(a, interpret=True, trail="bf16")


def test_panel_rejects_complex():
    from morfem_tpu.ops.solve import use_panel_factorization

    with pytest.raises(ValueError, match="real operators"):
        use_panel_factorization(
            jnp.complex128, MorfemConfig(factorization="panel")
        )


@pytest.mark.parametrize(
    "g,n,w,p",
    [
        (2, 64, 128, 128),
        (3, 256, 256, 256),
        (1, 384, 128, 384),
        (2, 512, 384, 256),
    ],
)
def test_gather_rows_matches_take(rng, g, n, w, p):
    """The DMA gather kernel on the panel-LU critical path vs jnp.take —
    several shapes incl. the production widths P=256/384, duplicate and
    repeated indices (ADVICE r4: the kernel had no direct unit test).
    Interpret mode here (CPU suite); the compiled Mosaic lowering is
    exercised on-chip by tools/onchip_smoke.py."""
    from morfem_tpu.ops.pallas.row_gather import gather_rows

    src = jnp.asarray(
        rng.standard_normal((g, n, w)), jnp.float32
    )
    idx = rng.integers(0, n, size=(g, p))
    idx[:, : p // 4] = idx[:, p // 2 : p // 2 + p // 4]  # duplicates
    idx[0, 0] = idx[0, 1] = 0  # repeated boundary row
    idx = jnp.asarray(idx, jnp.int32)
    out = gather_rows(src, idx, interpret=True)
    ref = jnp.take_along_axis(src, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_rejects_bad_inputs():
    from morfem_tpu.ops.pallas.row_gather import gather_rows

    src = jnp.zeros((2, 64, 128), jnp.float32)
    idx = jnp.zeros((2, 128), jnp.int32)
    with pytest.raises(ValueError, match="f32-only"):
        gather_rows(src.astype(jnp.bfloat16), idx, interpret=True)
    with pytest.raises(ValueError, match="P % 128"):
        gather_rows(src, idx[:, :64], interpret=True)


def test_factor_rejects_unaligned_panel():
    """Direct callers bypass config validation; the factor functions must
    name the parameter instead of failing deep inside row_gather
    (ADVICE r4)."""
    from morfem_tpu.ops.panel_lu import panel_lu_factor, panel_lu_factor_block

    a = jnp.eye(64, dtype=jnp.float32)[None]
    for fac in (panel_lu_factor, panel_lu_factor_block):
        with pytest.raises(ValueError, match="panel must be a multiple"):
            fac(a, panel=96, interpret=True)
