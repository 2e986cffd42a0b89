"""Complex-operator systems via the real 2N embedding (ops/complex_split).

Oracle: NumPy's native complex solves — the same path the reference uses
implicitly (implementation.py:468-480). VERDICT round-1 acceptance: a
complex-symmetric system solved on the TPU-compatible path matching the
CPU complex oracle to 1e-8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morfem_tpu import MorfemConfig, morfem
from morfem_tpu.ops.complex_split import (
    embed_affine_system,
    real_embedding,
    solve_complex,
    solve_complex_split,
    split_solution,
)

CFG = MorfemConfig(factor_dtype_name="float32", refine_iterations=8)


def _complex_symmetric_system(n=32, m=2, seed=0):
    rng = np.random.default_rng(seed)

    def sym(scale):
        a = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) * scale
        return (a + a.T) / 2

    # diagonally shifted so A(t) is invertible over the domain
    a0 = sym(1.0 / n) + np.eye(n) * (3.0 + 25.0 + 0.5j)
    a1 = sym(1.0 / n)
    a2 = sym(1.0 / n)
    b = rng.normal(size=(n, m)) + 1j * rng.normal(size=(n, m))
    return a0, a1, a2, b


def test_solve_complex_split_matches_numpy():
    a0, _, _, b = _complex_symmetric_system()
    x = solve_complex(a0, b, CFG)
    ref = np.linalg.solve(a0, b)
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-12


def test_solve_complex_split_f32_factor_refines_to_f64():
    """The f32-factored embedding must refine well past c64 accuracy."""
    a0, _, _, b = _complex_symmetric_system(n=48, seed=3)
    x_re, x_im = solve_complex_split(
        jnp.asarray(a0.real), jnp.asarray(a0.imag),
        jnp.asarray(b.real), jnp.asarray(b.imag), CFG,
    )
    x = np.asarray(x_re) + 1j * np.asarray(x_im)
    r = np.linalg.norm(a0 @ x - b) / np.linalg.norm(b)
    assert r < 1e-12  # c64 arithmetic alone floors around 1e-6


def test_real_embedding_identity():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5))
    x = rng.normal(size=(5, 3)) + 1j * rng.normal(size=(5, 3))
    k = real_embedding(jnp.asarray(a.real), jnp.asarray(a.imag))
    xe = jnp.concatenate([jnp.asarray(x.real), jnp.asarray(x.imag)], axis=0)
    ye = np.asarray(k @ xe)
    y = ye[:5] + 1j * ye[5:]
    np.testing.assert_allclose(y, a @ x, rtol=1e-12)


def test_embedded_system_full_mor_pipeline_matches_complex_oracle():
    """Greedy MOR on the embedded system ≡ MOR on the complex problem."""
    a0, a1, a2, b = _complex_symmetric_system(n=40, m=2, seed=7)
    domain = np.linspace(3.0, 5.0, 24)
    # NOTE estimator semantics follow the reference (implementation.py:424):
    # err = ‖RᴴR‖_F ≈ residual², so a 1e-20 threshold targets ~1e-10
    # absolute residuals → well past 1e-8 relative solution error here.
    cfg = MorfemConfig(
        symmetrize=False,
        error_threshold=1e-20,
        factor_dtype_name="float32",
        refine_iterations=8,
        max_greedy_iterations=20,
    )
    sys_e = embed_affine_system(domain, a0, a1, a2, b, config=cfg)
    assert sys_e.a0.shape == (80, 80)
    x, q, *_ = morfem(
        sys_e.domain, sys_e.a0, sys_e.a1, sys_e.a2, sys_e.b, config=cfg
    )
    # reconstruct full-order embedded solutions, reassemble complex
    xf = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    xr, xi = split_solution(jnp.asarray(xf))
    x_c = np.asarray(xr) + 1j * np.asarray(xi)
    for i, t in enumerate(domain):
        a_t = a0 + t * a1 + t**2 * a2
        ref = np.linalg.solve(a_t, t * b)
        rel = np.linalg.norm(x_c[i] - ref) / np.linalg.norm(ref)
        assert rel < 1e-8, (i, rel)


def test_embed_raises_on_symmetrize_with_imag():
    a0, a1, a2, b = _complex_symmetric_system(n=8)
    with pytest.raises(ValueError, match="symmetrize"):
        embed_affine_system(
            np.linspace(3, 5, 4), a0, a1, a2, b,
            config=MorfemConfig(symmetrize=True),
        )


def test_embed_real_input_allows_symmetrize():
    rng = np.random.default_rng(4)
    n = 8
    a = rng.normal(size=(n, n)) + 0j  # complex dtype, zero imaginary part
    b = rng.normal(size=(n, 2)) + 0j
    sys_e = embed_affine_system(
        np.linspace(3, 5, 4), a, a, a, b,
        config=MorfemConfig(symmetrize=True),
    )
    assert sys_e.a0.shape == (2 * n, 2 * n)


def test_complex_sparse_matfree_morfem_matches_dense_oracle():
    """Complex SPARSE inputs past dense_cutoff auto-route through the
    interleaved real 2N embedding (band structure preserved) and the
    matrix-free pipeline; splu's dtype-genericity parity
    (implementation.py:474-480)."""
    import scipy.sparse as sp

    from morfem_tpu.mor.api import morfem

    rng = np.random.default_rng(7)
    n = 600
    # absorbing Helmholtz: complex-symmetric banded A0, A(t) = A0 − t²·I
    half = 6
    offs = list(range(0, half + 1))
    diags = [(8.0 + rng.random(n)) + 1j * 0.4] + [
        (-0.3 + 0.05j) * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5  # complex symmetric (NOT hermitian)
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 2.0, 24)
    cfg = MorfemConfig(
        symmetrize=False,
        dense_cutoff=256,  # force the matrix-free route at N=600
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.7,
    )
    x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
    assert np.iscomplexobj(np.asarray(q)) and q.shape[0] == n
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 12, 23):
        t = domain[i]
        ref = np.linalg.solve(
            a0.toarray() - t**2 * np.eye(n), t * np.asarray(b)
        )
        worst = max(
            worst,
            float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-7, worst


def test_complex_sparse_matfree_rejects_symmetrize():
    import scipy.sparse as sp

    from morfem_tpu.mor.api import morfem

    n = 300
    a0 = (sp.eye(n) * (3.0 + 1j)).tocsr()
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = np.ones((n, 1))
    domain = np.linspace(0.5, 1.0, 4)
    cfg = MorfemConfig(dense_cutoff=128, use_equally_distributed=True)
    with pytest.raises(ValueError, match="symmetrize"):
        morfem(domain, a0, a1, a2, b, config=cfg)


def test_complex_dense_embedded_morfem_matches_native_complex():
    """The TPU routing for complex DENSE inputs (`_morfem_embedded_dense`,
    auto-taken when backend == 'tpu') must reproduce the native complex
    pipeline's solutions; exercised directly here since tests run on CPU."""
    from morfem_tpu.mor.api import _morfem_embedded_dense, morfem
    from morfem_tpu.utils.timing import PhaseTimer

    rng = np.random.default_rng(9)
    n = 96
    g = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a0 = (g + g.T) * 0.5 + (6.0 + 1.5j) * np.eye(n)
    a1 = np.zeros((n, n))
    a2 = -np.eye(n, dtype=complex)
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 1.6, 16)
    cfg = MorfemConfig(
        symmetrize=False, error_threshold=1e-10,
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.5,
    )
    from morfem_tpu.system import _default_t_a0, _default_t_a1
    from morfem_tpu.system import _default_t_a2, _default_t_b

    x_e, q_e, *_ = _morfem_embedded_dense(
        domain, a0, a1, a2, b,
        _default_t_a0, _default_t_a1, _default_t_a2, _default_t_b,
        cfg, PhaseTimer(disabled=True),
    )
    rec_e = np.einsum("nk,ikm->inm", np.asarray(q_e), np.asarray(x_e))
    worst = 0.0
    for i in (0, 8, 15):
        t = domain[i]
        ref = np.linalg.solve(a0 - t**2 * np.eye(n), t * b)
        worst = max(
            worst,
            float(np.linalg.norm(rec_e[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-8, worst


def test_complex_sparse_greedy_matfree():
    """GREEDY strategy over a complex sparse pencil: the interleaved
    embedding yields a NON-symmetric real banded pencil — the banded
    direct snapshot path and the matrix-free estimator must handle it."""
    import scipy.sparse as sp

    from morfem_tpu.mor.api import morfem

    rng = np.random.default_rng(7)
    n = 400
    half = 5
    offs = list(range(0, half + 1))
    diags = [(8.0 + rng.random(n)) + 1j * 0.4] + [
        (-0.3 + 0.05j) * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 2.0, 16)
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-11
    )
    x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 8, 15):
        t = domain[i]
        ref = np.linalg.solve(
            a0.toarray() - t**2 * np.eye(n), t * np.asarray(b)
        )
        worst = max(
            worst, float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref))
        )
    assert worst < 1e-8, worst


def _complex_banded_sparse(n=400, half=5, seed=7):
    """Absorbing-Helmholtz-like complex-symmetric banded pencil."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    offs = list(range(0, half + 1))
    diags = [(8.0 + rng.random(n)) + 1j * 0.4] + [
        (-0.3 + 0.05j) * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    return a0, a1, a2, b


def test_complex_tb_phase_callable_matfree():
    """t_b(t) = t·e^{iωt}: the phase folds EXACTLY into the real pipeline
    (|t_b| drive + per-point phase on x) — splu dtype-genericity parity
    for complex coefficient callables (implementation.py:468-480)."""
    from morfem_tpu.mor.api import morfem

    n = 400
    a0, a1, a2, b = _complex_banded_sparse(n=n)
    domain = np.linspace(0.8, 2.0, 16)
    t_b = lambda t: t * jnp.exp(1j * 0.7 * t)  # noqa: E731
    # threshold is the reference's ABSOLUTE squared residual; 1e-18
    # drives the basis until ~1e-9 absolute residuals (measured: Nr=16,
    # worst rel 4.3e-13 — splu-grade)
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-18
    )
    x, q, *_ = morfem(domain, a0, a1, a2, b, t_b=t_b, config=cfg)
    assert np.iscomplexobj(np.asarray(x))  # phase folded into x
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 7, 15):
        t = domain[i]
        ref = np.linalg.solve(
            a0.toarray() - t**2 * np.eye(n),
            (t * np.exp(1j * 0.7 * t)) * np.asarray(b),
        )
        worst = max(
            worst,
            float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-11, worst


def test_complex_operator_coefficients_matfree():
    """Complex t_a2 (damped wave coefficient): splits into Re/Im operator
    addends (P=4 here) through the P-generic matrix-free pipeline."""
    from morfem_tpu.mor.api import morfem

    n = 400
    a0, a1, a2, b = _complex_banded_sparse(n=n)
    domain = np.linspace(0.8, 2.0, 16)
    t_a2 = lambda t: t**2 * jnp.exp(1j * 0.25 * t)  # noqa: E731
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-18
    )
    x, q, *_ = morfem(domain, a0, a1, a2, b, t_a2=t_a2, config=cfg)
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 7, 15):
        t = domain[i]
        c2 = t**2 * np.exp(1j * 0.25 * t)
        ref = np.linalg.solve(
            a0.toarray() + c2 * a2.toarray(), t * np.asarray(b)
        )
        worst = max(
            worst,
            float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-10, worst


def test_real_operators_complex_coefficients_route_embedded():
    """REAL sparse operators with complex coefficients must also take the
    embedding route (the system is complex even though the matrices are
    not) — both greedy and equally-distributed strategies."""
    import scipy.sparse as sp

    from morfem_tpu.mor.api import morfem

    rng = np.random.default_rng(3)
    n = 360
    main = 8.0 + rng.random(n)
    off = -0.4 * np.ones(n - 1)
    a0 = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 2.0, 12)
    t_a0 = lambda t: jnp.exp(1j * 0.2 * t)  # noqa: E731
    # equally-distributed accuracy is seed-count-limited (same 1e-7-grade
    # bound as test_complex_sparse_matfree_morfem_matches_dense_oracle);
    # greedy refines to threshold
    for extra_cfg, bound in (
        (dict(error_threshold=1e-18), 1e-9),
        (dict(use_equally_distributed=True,
              equally_distributed_reduction_rate=0.5), 1e-6),
    ):
        cfg = MorfemConfig(
            symmetrize=False, dense_cutoff=128, **extra_cfg
        )
        x, q, *_ = morfem(domain, a0, a1, a2, b, t_a0=t_a0, config=cfg)
        assert np.iscomplexobj(np.asarray(q))
        rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
        worst = 0.0
        for i in (0, 5, 11):
            t = domain[i]
            c0 = np.exp(1j * 0.2 * t)
            ref = np.linalg.solve(
                c0 * a0.toarray() - t**2 * np.eye(n), t * b
            )
            worst = max(
                worst,
                float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
            )
        assert worst < bound, (extra_cfg, worst)


def test_fully_complex_system_all_callables_complex():
    """Everything complex at once — operators, all three operator
    coefficients, and t_b (P=6 embedded addends + phase fold) — against
    the dense complex oracle at every domain point."""
    from morfem_tpu.mor.api import morfem

    n = 400
    a0, a1, a2, b = _complex_banded_sparse(n=n, seed=11)
    domain = np.linspace(0.8, 2.0, 12)
    fns = dict(
        t_a0=lambda t: jnp.exp(1j * 0.1 * t),
        t_a1=lambda t: (0.02 + 0.01j) * t,
        t_a2=lambda t: t**2 * jnp.exp(1j * 0.3 * t),
        t_b=lambda t: t * jnp.exp(1j * 0.7 * t),
    )
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-18
    )
    x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg, **fns)
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    a1d = a1.toarray()
    worst = 0.0
    for i in range(len(domain)):
        t = domain[i]
        a_t = (
            np.exp(1j * 0.1 * t) * a0.toarray()
            + (0.02 + 0.01j) * t * a1d
            + t**2 * np.exp(1j * 0.3 * t) * a2.toarray()
        )
        ref = np.linalg.solve(
            a_t, (t * np.exp(1j * 0.7 * t)) * np.asarray(b)
        )
        worst = max(
            worst,
            float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-9, worst


def test_complex_return_contract_self_consistent():
    """r4 verdict missing #3: the complex routes must return a
    SELF-CONSISTENT complex reduced model — x re-derivable from
    (r0, r1, r2, b_r) alone, q complex-orthonormal, r_i = qᵀ·a_i·q."""
    from morfem_tpu.mor.api import morfem
    from morfem_tpu.mor.complex_model import sweep_complex_reduced

    n = 400
    a0, a1, a2, b = _complex_banded_sparse(n=n)
    domain = np.linspace(0.8, 2.0, 16)
    t_b = lambda t: t * jnp.exp(1j * 0.7 * t)  # noqa: E731
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-18
    )
    x, q, r0, r1, r2, b_r = morfem(domain, a0, a1, a2, b, t_b=t_b,
                                   config=cfg)
    q = np.asarray(q)
    # q is complex-orthonormal (compressed)
    gram = q.conj().T @ q
    assert np.linalg.norm(gram - np.eye(q.shape[1])) < 1e-12
    # r_i really are the bilinear projections of the ORIGINAL operators
    assert np.linalg.norm(r0 - q.T @ (a0 @ q)) < 1e-10 * np.linalg.norm(r0)
    assert np.linalg.norm(b_r - q.T @ b) < 1e-12 * np.linalg.norm(b_r)
    # x solves the returned reduced model (the reference's own recipe,
    # implementation.py:186)
    x_re = sweep_complex_reduced(
        r0, r1, r2, b_r, domain,
        lambda t: jnp.ones_like(t), lambda t: t, lambda t: t**2, t_b,
    )
    assert np.linalg.norm(x_re - np.asarray(x)) < 1e-12 * np.linalg.norm(x)


def test_complex_model_checkpoint_offgrid_resweep():
    """r4 verdict missing #2 ("Done" condition): a complex-COEFFICIENT
    model is checkpointed, reloaded, swept on a DIFFERENT grid, and
    matches the SciPy complex oracle."""
    from morfem_tpu.mor.api import morfem
    from morfem_tpu.mor.complex_model import sweep_complex_reduced
    from morfem_tpu.mor.reduced import ReducedModel
    from morfem_tpu.utils.checkpoint import (
        load_reduced_model,
        save_reduced_model,
    )

    n = 400
    a0, a1, a2, b = _complex_banded_sparse(n=n, seed=5)
    domain = np.linspace(0.8, 2.0, 20)
    fns = dict(
        t_a0=lambda t: jnp.exp(1j * 0.1 * t),  # complex COEFFICIENTS
        t_a1=lambda t: jnp.zeros_like(t),
        t_a2=lambda t: t**2,
        t_b=lambda t: t * jnp.exp(1j * 0.7 * t),
    )
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=128, error_threshold=1e-18
    )
    x, q, r0, r1, r2, b_r = morfem(domain, a0, a1, a2, b, config=cfg,
                                   **fns)
    # checkpoint the returned complex reduced model through the standard
    # utility (complex arrays round-trip through .npz losslessly)
    import tempfile

    rm = ReducedModel(
        domain=jnp.asarray(domain), q=jnp.asarray(q),
        r0=jnp.asarray(r0), r1=jnp.asarray(r1), r2=jnp.asarray(r2),
        b_r=jnp.asarray(b_r), ncols=jnp.asarray(q.shape[1]), **fns,
    )
    with tempfile.TemporaryDirectory() as d:
        path = d + "/complex_model"
        save_reduced_model(path, rm)
        rm2 = load_reduced_model(path, **fns)
    # re-sweep a DIFFERENT grid (off the build grid, inside its span)
    grid2 = np.linspace(0.85, 1.95, 23)
    x2 = sweep_complex_reduced(
        np.asarray(rm2.r0), np.asarray(rm2.r1), np.asarray(rm2.r2),
        np.asarray(rm2.b_r), grid2, fns["t_a0"], fns["t_a1"],
        fns["t_a2"], fns["t_b"],
    )
    rec = np.einsum("nk,ikm->inm", np.asarray(rm2.q), x2)
    worst = 0.0
    for i in range(0, 23, 3):
        t = grid2[i]
        a_t = (
            np.exp(1j * 0.1 * t) * a0.toarray() + t**2 * a2.toarray()
        )
        ref = np.linalg.solve(a_t, (t * np.exp(1j * 0.7 * t)) * b)
        worst = max(
            worst,
            float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref)),
        )
    assert worst < 1e-9, worst


def test_dense_complex_coefficients_cpu_route():
    """TPU sessions route DENSE systems with complex COEFFICIENT
    callables to `_morfem_dense_on_cpu` (the 2N embedding needs real
    coefficients; the interleaved machinery is sparse-only). Exercise
    the routed function directly — the pipeline it runs is the same
    dtype-generic dense path the CPU suite uses."""
    from morfem_tpu.mor.api import _morfem_dense_on_cpu
    from morfem_tpu.utils.timing import PhaseTimer

    rng = np.random.default_rng(21)
    n = 96
    g = rng.standard_normal((n, n))
    a0 = (g + g.T) * 0.5 + 6.0 * np.eye(n)
    a1 = np.zeros((n, n))
    a2 = -np.eye(n)
    b = rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 1.6, 12)
    t_a0 = lambda t: jnp.exp(1j * 0.2 * t)  # noqa: E731
    from morfem_tpu.system import _default_t_a1, _default_t_a2, _default_t_b

    cfg = MorfemConfig(
        symmetrize=False, error_threshold=1e-18,
        max_greedy_iterations=20,
    )
    x, q, r0, r1, r2, b_r = _morfem_dense_on_cpu(
        domain, a0, a1, a2, b, t_a0, _default_t_a1, _default_t_a2,
        _default_t_b, cfg, PhaseTimer(disabled=True),
    )
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 6, 11):
        t = domain[i]
        ref = np.linalg.solve(
            np.exp(1j * 0.2 * t) * a0 - t**2 * np.eye(n), t * b
        )
        worst = max(
            worst, float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref))
        )
    assert worst < 1e-9, worst


def test_compress_complex_basis_drops_phase_redundancy():
    """The real embedding stores v and i·v as independent directions;
    over C they span one line — compression must drop the redundancy
    while preserving the span exactly."""
    from morfem_tpu.mor.complex_model import compress_complex_basis

    rng = np.random.default_rng(3)
    n = 40
    v1 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    v2 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    q = np.stack([v1, 1j * v1, v2, (0.3 - 0.8j) * v2 + 2 * v1], axis=1)
    q_hat = compress_complex_basis(q)
    assert q_hat.shape == (n, 2)  # complex rank is 2
    gram = q_hat.conj().T @ q_hat
    assert np.linalg.norm(gram - np.eye(2)) < 1e-13
    # span preserved: projecting the original columns loses nothing
    proj = q_hat @ (q_hat.conj().T @ q)
    assert np.linalg.norm(proj - q) < 1e-12 * np.linalg.norm(q)
