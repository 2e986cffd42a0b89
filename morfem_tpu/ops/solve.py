"""Dense linear solvers: mixed-precision LU with iterative refinement.

The reference solves every system (both the N×N full-order FEM systems and
the Nr×Nr reduced ones) with a direct LU factorization: SciPy `splu` on
sparse inputs, `lu_factor`/`lu_solve` on dense
(reference: implementation.py:468-480).

TPU has no sparse direct solver, and float64 LU does not compile on TPU at
all. The TPU-native design is:

  * factorize in ``factor_dtype`` (float32 → the MXU does the O(N³) work at
    full speed);
  * when the working dtype is wider (float64, emulated on TPU but fine for
    O(N²) work), run a few steps of classical iterative refinement:
    ``r = b − A·x;  x += LU⁻¹·r``.

Two refinement steps recover ~1e-15 relative residuals for well-conditioned
systems — comfortably beating the 1e-8 acceptance target — while the
expensive O(N³) factorization stays in fast float32. On CPU (tests) float64
LU is available and refinement becomes a no-op guard.

Complex systems are supported: the factor dtype is promoted to the matching
complex type.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.assembly import assemble_at
from morfem_tpu.ops.precision import precise_matmul
from morfem_tpu.system import AffineSystem

_HI = jax.lax.Precision.HIGHEST  # TPU f64 matmuls degrade at default precision


def factor_dtype_like(dtype, factor_dtype_name: str):
    """Resolve the factorization dtype for a given working dtype.

    Promotes to complex when the working dtype is complex, and never uses a
    *wider* factorization than the working dtype.
    """
    work = jnp.dtype(dtype)
    if work in (jnp.complex64, jnp.complex128):
        fd = jnp.complex64 if factor_dtype_name == "float32" else jnp.complex128
        if work == jnp.complex64:
            fd = jnp.complex64
        return jnp.dtype(fd)
    fd = jnp.dtype(factor_dtype_name)
    if jnp.finfo(work).bits < jnp.finfo(fd).bits:
        fd = work
    return fd


def lu_solve_refined(
    a: jax.Array,
    b: jax.Array,
    *,
    factor_dtype=jnp.float32,
    refine_iterations: int = 2,
    residual_mm=None,
) -> jax.Array:
    """Solve ``a @ x = b`` by LU in `factor_dtype` + refinement in a.dtype.

    Args:
      a: [N, N] system matrix (working precision).
      b: [N, M] right-hand side (working precision).
      factor_dtype: dtype for the LU factorization (the O(N³) part).
      refine_iterations: refinement steps; skipped automatically when the
        working dtype is not wider than the factorization dtype.
      residual_mm: optional accurate matmul ``x ↦ A·x`` for the
        refinement residuals (e.g. hoisted-split shared applies,
        ops/assembly.py::SharedAffineApply); defaults to an internal
        Ozaki/chunked product of ``a``.

    Returns:
      x: [N, M] solution in the working precision of ``a``/``b``.
    """
    work_dtype = jnp.result_type(a.dtype, b.dtype)
    factor_dtype = jnp.dtype(factor_dtype)
    if jnp.issubdtype(a.dtype, jnp.complexfloating) and not jnp.issubdtype(
        factor_dtype, jnp.complexfloating
    ):
        factor_dtype = jnp.dtype(
            jnp.complex64 if factor_dtype == jnp.float32 else jnp.complex128
        )

    lu, piv = jsl.lu_factor(a.astype(factor_dtype))
    # A real factorization can still serve complex right-hand sides by
    # solving the stacked [Re(b) | Im(b)] — casting b to a real factor
    # dtype would silently drop the imaginary part.
    split_complex = jnp.issubdtype(
        work_dtype, jnp.complexfloating
    ) and not jnp.issubdtype(factor_dtype, jnp.complexfloating)

    def apply_factor(rhs):
        if split_complex:
            stacked = jnp.concatenate(
                [rhs.real, rhs.imag], axis=-1
            ).astype(factor_dtype)
            sol = jsl.lu_solve((lu, piv), stacked).astype(
                jnp.zeros((), work_dtype).real.dtype
            )
            m = rhs.shape[-1]
            return (sol[..., :m] + 1j * sol[..., m:]).astype(work_dtype)
        return jsl.lu_solve((lu, piv), rhs.astype(factor_dtype)).astype(
            work_dtype
        )

    x = apply_factor(b)
    needs_refine = refine_iterations > 0 and (
        jnp.finfo(work_dtype).bits > jnp.finfo(factor_dtype).bits
        or split_complex
    )
    if needs_refine:
        x = _refine_adaptive(
            a, b, x, apply_factor, refine_iterations, residual_mm=residual_mm
        )
    return x


def _refine_adaptive(
    a, b, x0, apply_factor, refine_iterations: int, residual_mm=None
):
    """Adaptive iterative refinement around any approximate solver.

    Converges to working precision; the greedy deliberately samples
    near-resonance points where cond(A)·ε_f32 approaches 1, so the
    contraction per step can be slow (~0.8) — iterate adaptively instead
    of a fixed count, and stop on stagnation. Residuals are computed with
    the chunked-f64 `precise_matmul` (TPU's emulated f64 loses 8 digits on
    wide contractions otherwise).
    """
    work_dtype = jnp.result_type(a.dtype, b.dtype)
    a_w = a.astype(work_dtype)
    b_w = b.astype(work_dtype)
    rdtype = jnp.zeros((), work_dtype).real.dtype
    tol = 10 * jnp.finfo(work_dtype).eps * jnp.linalg.norm(b_w)

    # A is loop-invariant: on the TPU real-f64 path, pre-split it once for
    # the Ozaki residual matmuls (2.7 ms/iter prepared vs 8 ms emulated
    # f64 at N=3456) — XLA does not hoist the split out of the while_loop
    # on its own (measured).
    from morfem_tpu.ops import precision as _prec

    if residual_mm is not None:
        pass  # caller supplied an accurate A·x (hoisted-split applies)
    elif (
        work_dtype == jnp.dtype(jnp.float64)
        and a_w.shape[-1] >= _prec.OZAKI_MIN_K
        and jax.default_backend() == "tpu"
    ):
        from morfem_tpu.ops.precision import ozaki_apply, ozaki_prepare

        prep = ozaki_prepare(a_w)

        def residual_mm(x):
            return ozaki_apply(prep, x)
    else:
        def residual_mm(x, _a=a_w):
            return precise_matmul(_a, x)

    def cond_fn(state):
        _, _, r_norm, r_prev, it = state
        improving = r_norm < 0.95 * r_prev
        return jnp.logical_and(
            jnp.logical_and(r_norm > tol, improving),
            it < refine_iterations,
        )

    def body_fn(state):
        x, r, r_norm, _, it = state
        x = x + apply_factor(r)
        r_new = b_w - residual_mm(x)
        return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

    r0 = b_w - residual_mm(x0)
    r0n = jnp.linalg.norm(r0)
    # the ∞ init DERIVES from r0n (not a fresh constant): under shard_map
    # (the sp-sharded full-order sweep) the loop outputs are varying over
    # the mesh axis and a while_loop carry may not mix unvarying inits
    # with varying outputs
    inf0 = r0n * 0 + jnp.asarray(jnp.inf, rdtype)
    state = (x0, r0, r0n, inf0, jnp.asarray(0))
    x, _, _, _, _ = lax.while_loop(cond_fn, body_fn, state)
    return x


def gj_solve_refined(
    a: jax.Array,
    b: jax.Array,
    *,
    refine_iterations: int = 2,
    panel: int = 256,
    sub: int = 8,
) -> jax.Array:
    """Solve ``a @ x = b`` via the blocked MXU Gauss-Jordan inverse.

    The GEMM-only alternative to `lu_solve_refined` for REAL systems:
    `ops/blocked_inverse.py::gj_inverse_f32` produces an explicit f32
    approximate inverse at MXU rates (measured ~10× XLA's LuDecomposition
    at N≈3.4k), and applying it — including inside every f64 refinement
    step — is a single matmul, avoiding XLA's slow TriangularSolve
    entirely. Complex right-hand sides ride the same real inverse via a
    stacked [Re(b) | Im(b)] solve.
    """
    from morfem_tpu.ops.blocked_inverse import gj_inverse_f32

    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise ValueError(
            "gj_solve_refined factorizes real operators only; use "
            "lu_solve_refined (or the split-real path) for complex systems"
        )
    work_dtype = jnp.result_type(a.dtype, b.dtype)
    ainv = gj_inverse_f32(a, panel=panel, sub=sub)
    complex_rhs = jnp.issubdtype(work_dtype, jnp.complexfloating)

    from morfem_tpu.ops.precision import matmul_f32_accurate

    # the apply must be f32-TRUE: a default (1-pass bf16) matmul's ~2e-3
    # error enters the refinement iteration matrix as ‖E‖·cond(A) and
    # diverges it for cond ≳ 500 (observed on the waveguide system).
    def apply_factor(rhs):
        if complex_rhs:
            stacked = jnp.concatenate(
                [rhs.real, rhs.imag], axis=-1
            ).astype(jnp.float32)
            sol = matmul_f32_accurate(ainv, stacked).astype(
                jnp.zeros((), work_dtype).real.dtype
            )
            m = rhs.shape[-1]
            return (sol[..., :m] + 1j * sol[..., m:]).astype(work_dtype)
        return matmul_f32_accurate(
            ainv, rhs.astype(jnp.float32)
        ).astype(work_dtype)

    x = apply_factor(b)
    refine = refine_iterations > 0 and (
        jnp.finfo(work_dtype).bits > 32 or complex_rhs
    )
    if refine:
        x = _refine_adaptive(a, b, x, apply_factor, refine_iterations)
    return x


def inv_refined(
    a: jax.Array,
    *,
    factor_dtype=jnp.float32,
    refine_iterations: int = 2,
) -> jax.Array:
    """Matrix inverse via mixed-precision LU + refinement (batched).

    ``jnp.linalg.inv`` lowers to an LU decomposition, which TPU only
    implements for f32/c64 — this routine keeps f64 accuracy on TPU the
    same way `lu_solve_refined` does. Supports leading batch axes.
    """
    work_dtype = a.dtype
    factor_dtype = jnp.dtype(factor_dtype)
    eye = jnp.broadcast_to(
        jnp.eye(a.shape[-1], dtype=work_dtype), a.shape
    )
    lu, piv = jsl.lu_factor(a.astype(factor_dtype))
    x = jsl.lu_solve((lu, piv), eye.astype(factor_dtype)).astype(work_dtype)
    if refine_iterations > 0 and (
        jnp.finfo(work_dtype).bits > jnp.finfo(factor_dtype).bits
    ):
        def body(_, x):
            r = eye - jnp.matmul(a, x, precision=_HI)
            d = jsl.lu_solve((lu, piv), r.astype(factor_dtype))
            return x + d.astype(work_dtype)

        x = lax.fori_loop(0, refine_iterations, body, x)
    return x


def use_gj_factorization(a_dtype, n: int, config: MorfemConfig) -> bool:
    """Resolve config.factorization for a given system (trace-time).

    "auto" currently resolves to LU everywhere: measured on the v5e at
    N=3411, XLA's batched f32 LU factorizes at ~23 ms/matrix while the
    blocked GJ inverse takes ~1 s/matrix — its MXU GEMMs are fine but the
    ~N sequential column steps pay XLA loop overhead that only a Pallas
    panel kernel would remove. The GJ backend stays available explicitly
    (``factorization="gj"``): it is the only factorization whose solve
    AND refinement applies are single matmuls (no XLA TriangularSolve),
    which wins when one factorization serves many re-solves.
    """
    if config.factorization == "gj":
        if jnp.issubdtype(a_dtype, jnp.complexfloating):
            raise ValueError(
                "factorization='gj' supports real operators only"
            )
        return True
    return False


def use_panel_factorization(a_dtype, config: MorfemConfig) -> bool:
    """Whether the batched sweep should take the blocked panel-LU path.

    "panel" forces it (real operators only); "auto" resolves to panel on
    TPU for real systems with an f32 factor dtype (the blocked-LU GEMM
    path beats XLA's LuDecomposition there — see BENCH extras for the
    measured factor rates). Complex pencils and CPU stay on the LU path.
    """
    complex_ops = jnp.issubdtype(a_dtype, jnp.complexfloating)
    if config.factorization == "panel":
        if complex_ops:
            raise ValueError(
                "factorization='panel' supports real operators only"
            )
        return True
    if config.factorization == "auto":
        return (
            not complex_ops
            and config.factor_dtype_name == "float32"
            and jax.default_backend() == "tpu"
        )
    return False


def solve_dense(
    a: jax.Array,
    b: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
    residual_mm=None,
) -> jax.Array:
    """Direct dense solve honoring `config.factorization` (see config.py).

    ``factorization="panel"`` (EXPLICIT only — "auto" routes single
    solves to LU) factorizes through the blocked panel-LU GEMM path;
    batched sweeps take it under "auto" on TPU (`solve_sweep`).
    """
    if config.factorization == "panel" and not jnp.issubdtype(
        a.dtype, jnp.complexfloating
    ):
        from morfem_tpu.ops.panel_lu import solve_batch_panel

        return solve_batch_panel(a[None], b[None], config)[0]
    if use_gj_factorization(a.dtype, a.shape[-1], config):
        return gj_solve_refined(
            a, b, refine_iterations=config.refine_iterations
        )
    return lu_solve_refined(
        a,
        b,
        factor_dtype=factor_dtype_like(a.dtype, config.factor_dtype_name),
        refine_iterations=config.refine_iterations,
        residual_mm=residual_mm,
    )


def solve_point(
    sys: AffineSystem,
    t: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
    shared=None,
) -> jax.Array:
    """Solve the full-order system at one parameter point.

    Counterpart of the reference's ``solve_fem_point``
    (implementation.py:468-480): assemble A(t), b(t), solve directly.
    Returns x with shape [N, M].

    ``shared`` (optional): a `SharedAffineApply` built from the SAME
    operators/symmetrization — refinement residuals then reuse its
    hoisted operand splits instead of re-splitting A(t) (keeps the
    greedy while_loop's trace and runtime lean).
    """
    a, b = assemble_at(sys, t, symmetrize=config.symmetrize)
    residual_mm = None
    if shared is not None:
        c, _ = sys.coefficients(t)

        def residual_mm(x):
            return shared.apply(c, x)

    return solve_dense(a, b, config, residual_mm=residual_mm)


def solve_batch(
    sys: AffineSystem,
    ts: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
    shared=None,
) -> jax.Array:
    """Solve the full-order system at a batch of points — vmapped LU.

    All points factorize concurrently on device. Memory: ``len(ts)`` N×N
    factor-dtype matrices live at once; use `solve_sweep` for long grids.
    """
    return jax.vmap(lambda t: solve_point(sys, t, config, shared=shared))(ts)


def solve_sweep(
    sys: AffineSystem,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> jax.Array:
    """Full-order sweep over the whole domain — the no-MOR baseline.

    Counterpart of ``solve_finite_element_method``
    (reference: implementation.py:189-194), which loops over the domain in
    Python. Here the sweep runs as `lax.map` over chunks of vmapped LU
    solves: each chunk's factorizations batch onto the MXU while HBM holds
    only ``solve_chunk`` N×N factorizations at a time.

    Returns:
      x: [I, N, M] solutions for every domain point.
    """
    if use_panel_factorization(sys.b.dtype, config):
        from morfem_tpu.ops.panel_lu import solve_sweep_panel

        return solve_sweep_panel(sys, config)
    i = sys.num_points
    chunk = max(1, min(config.solve_chunk, i))
    pad = (-i) % chunk
    ts = jnp.concatenate([sys.domain, jnp.broadcast_to(sys.domain[-1:], (pad,))])
    ts = ts.reshape((-1, chunk))
    # Refinement residuals ride ONE hoisted split of the three shared
    # operators instead of a per-point Ozaki split of the assembled
    # [chunk, N, N] f64 A(t) — the per-point splits alone cost
    # ~slices·chunk·N² bf16 of HBM (4.5 GB at chunk 20, N=3411; observed
    # RESOURCE_EXHAUSTED) and redo work the affine structure shares.
    from morfem_tpu.ops.assembly import SharedAffineApply

    c_probe, cb_probe = sys.coefficients(sys.domain[:1])
    if jnp.issubdtype(
        jnp.result_type(sys.dtype, c_probe.dtype, cb_probe.dtype),
        jnp.complexfloating,
    ):
        shared = None  # ozaki applies are real-only (assembly.py raises)
    else:
        shared = SharedAffineApply(
            sys.operators(),
            symmetrize=config.symmetrize and not sys.symmetric_ops,
        )
        if shared.preps is None:
            shared = None  # off the ozaki path: local matmuls are fine
    xs = lax.map(lambda tc: solve_batch(sys, tc, config, shared=shared), ts)
    xs = xs.reshape((-1,) + xs.shape[2:])
    return xs[:i]
