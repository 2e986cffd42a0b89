"""Framework configuration.

The reference keeps its knobs as module-level globals
(reference: implementation.py:12-16 — ERROR_THRESHOLD, USE_EQUALLY_DISTRIBUTED,
EQUALLY_DISTRIBUTED_REDUCTION_RATE, PLOT_GREEDY_ITERATIONS, USE_OPM). Globals
are hostile to `jax.jit` (retracing, hidden state), so here every knob lives in
one frozen dataclass that is passed explicitly and hashed as a static jit
argument.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MorfemConfig:
    """All tunables of the MOR pipeline. Hashable → usable as a static jit arg.

    Attributes:
      error_threshold: greedy convergence threshold on the max error
        estimate over the domain (reference: implementation.py:12). NOTE
        the estimate is ‖R(t)ᴴR(t)‖_F — QUADRATIC in the residual R, the
        reference's exact semantics (implementation.py:424) — so a
        threshold of 1e-10 admits residuals around 1e-5 relative to the
        problem scale; pick the threshold for the square of the residual
        level you want.
      factorization: direct-solver backend for full-order N×N solves.
        "lu" — XLA's LU factorization (the reference's splu/lu_factor
        analogue, implementation.py:468-480). "gj" — blocked MXU
        Gauss-Jordan inverse (ops/blocked_inverse.py): every solve and
        refinement step becomes one matmul (no XLA TriangularSolve); real
        operators only, and currently slower to FACTOR than XLA's batched
        LU (see ops/solve.py::use_gj_factorization) — pick it when one
        factorization serves many re-solves. "panel" — blocked panel LU
        with the Pallas panel kernel (ops/panel_lu.py): rank-128 GEMM
        trailing updates on the MXU, scan-of-matmuls triangular solves;
        real operators only. "auto" (default) resolves to "panel" for
        real f32-factored batched sweeps on TPU, else "lu". Two panel
        knobs: `panel_trail` — "accurate" (default, f32-true bf16x6
        trailing updates) or "fast" (bf16x3, ~1.6× faster factor,
        escalates per chunk when refinement stagnates); `panel_pivot` —
        "block" (default): pivot only within each 128-row diagonal block,
        so the whole factor is GEMMs (measured 1.7× faster full-order
        sweep at N=3411: 1.8 s vs 3.1 s for 100 points) with a
        residual-checked escalation to "full" partial pivoting per chunk
        (block pivoting's element growth is unbounded on ill-conditioned
        diagonal blocks; escalation makes it exact-safe), or "full":
        always partial pivoting over all remaining rows; `panel_width` —
        the blocked factor's panel size (multiple of 128; wider panels
        mean fewer sequential steps and fatter trailing GEMMs per step,
        at more padded work when N is far from a multiple). Default 384:
        the full-order waveguide sweep (N=3411, I=100, chunk=20) on the
        v5e measured 1.730/1.500/1.425/1.716 s at widths
        128/256/384/512 — wider panels win until the padded trailing
        work at N far from a multiple eats the gain. The full-pivot
        factor clamps wide panels back to 128 when its Pallas kernel's
        P×N VMEM buffers would not fit (N ≳ 2.4k).
      use_equally_distributed: select the equally-distributed basis strategy
        instead of the greedy one (reference: implementation.py:13, :175).
      equally_distributed_reduction_rate: fraction of domain points NOT used
        as seeds in the equally-distributed strategy; the seed count is
        ``floor(I * (1 - rate))`` (reference: implementation.py:14, :198-203).
      max_greedy_iterations: static upper bound on greedy iterations. The
        reference loops unboundedly (implementation.py:269); a static bound is
        required for a fully-compiled `lax.while_loop` with padded buffers.
      orthonormalization: "svd" — re-orthonormalize the whole padded basis by
        thin SVD each iteration (reference default, implementation.py:296-298);
        "mgs" — orthonormalize only the new snapshot columns against the
        existing base with twice-iterated classical Gram-Schmidt (the
        reference's USE_OPM path, implementation.py:275-295, :491-523, made
        numerically safe by the second pass).
      factor_dtype_name: dtype used for the LU factorization ("float32" or
        "float64"). On TPU, float64 LU does not compile, but float32 LU on the
        MXU plus float64 iterative refinement recovers ~1e-15 relative
        residuals; on CPU float64 may be used directly.
      refine_iterations: MAXIMUM iterative-refinement steps after each LU
        solve when the working dtype is wider than the factorization dtype
        (0 disables refinement). Refinement is adaptive — it stops as soon
        as the residual reaches working precision or stagnates — so the
        cap only binds for ill-conditioned systems: near-resonance points
        (which the greedy deliberately samples) contract slowly
        (~cond·ε_f32 per step) and genuinely need ~20 steps.
      solve_chunk: number of full-order systems materialized/factored at once
        in batched full-order sweeps (bounds HBM: chunk × N² × dtype bytes).
        NOTE: XLA's TPU LU kernel has a 16 MB scoped-VMEM budget that the
        BATCHED factorization exhausts around N ≳ 6k — use solve_chunk=1
        for very large N (the compile error names LuDecompositionBlock).
      use_pallas_reduced_sweep: run the reduced-model frequency sweep with the
        fused Pallas assemble+solve kernel instead of the XLA vmap path.
      symmetrize: apply the reference's `(A + Aᵀ)/2` symmetrization when
        assembling system matrices (reference: implementation.py:528). Kept on
        by default for result parity.
      estimator: "direct" (default) — evaluate the residual norm per domain
        point directly from U_p = A_p·Q as one batched einsum. The
        reference's 16-Gram-block expansion (implementation.py:348-452,
        kept as "gram") squares the operator scale before cancelling, so
        its accuracy floor is ~‖A‖²·ε; on TPU's emulated f64 that floor
        rises above practical thresholds. The direct form cancels at the
        residual-vector level (floor ~(‖b‖·ε)²) and is cheaper per greedy
        iteration anyway (no 9 K²-sized Gram contractions).
      estimator_chunk: domain points per chunk in the direct estimator
        (bounds the [chunk, N, M] residual intermediate in HBM).
      estimator_impl: residual-product backend of the direct estimator —
        "auto" | "einsum" | "ozaki" (see
        `mor/estimator.py::estimate_errors_direct`).
      sweep_method: how `morfem()` runs the final reduced sweep. "auto"
        (default): diagonalize two-term definite pencils once and sweep in
        O(K·M) per point (`mor/spectral.py`, ~7× faster than batched LU on
        dense grids), falling back to LU otherwise; "lu": always the
        batched-LU path; "spectral": require the spectral path (raises if
        the pencil doesn't qualify).
      dense_cutoff: `morfem()` keeps SciPy-sparse inputs MATRIX-FREE when
        N exceeds this (the reference stays sparse throughout via splu,
        implementation.py:474-476; densifying a 100k-DOF system would need
        ~80 GB). The sparse route: RCM-banded direct solves when the
        sparsity is band-recoverable, exact-operator GMRES with a
        truncated-band shifted-direct preconditioner otherwise
        (ops/block_tridiag.py, ops/sparse.py). Dense/array inputs always
        take the dense pipeline.
      band_max_half: largest RCM-reordered half-bandwidth the matrix-free
        route factorizes DIRECTLY (block-tridiagonal elimination costs
        O(N·half²) with O(N·half) factor memory). Beyond it the pencil is
        truncated to this band for the PRECONDITIONER only and solved
        with exact-operator GMRES (`GeneralSparseOperator`).
      dependency_tolerance: greedy stagnation guard. A new snapshot is only
        appended if, after projecting out the current basis, at least one of
        its columns retains more than this fraction of its norm. When the
        error threshold sits below the solver's accuracy floor, the greedy
        argmax re-picks the same point and the repeated snapshot is
        (numerically) linearly dependent; appending it degrades the basis
        toward rank deficiency — which makes TPU's emulated-f64 SVD produce
        NaNs. The reference has no such guard (it would loop forever,
        implementation.py:269-299); here stagnation terminates the loop
        cleanly with `converged=False`.
    """

    error_threshold: float = 1e-6
    factorization: str = "auto"
    use_equally_distributed: bool = False
    equally_distributed_reduction_rate: float = 0.97
    max_greedy_iterations: int = 40
    orthonormalization: str = "svd"
    factor_dtype_name: str = "float32"
    refine_iterations: int = 25
    solve_chunk: int = 8
    use_pallas_reduced_sweep: bool = False
    symmetrize: bool = True
    dependency_tolerance: float = 1e-12
    estimator: str = "direct"
    estimator_chunk: int = 1024
    estimator_impl: str = "auto"
    sweep_method: str = "auto"
    dense_cutoff: int = 8192
    band_max_half: int = 2048
    panel_trail: str = "accurate"
    panel_pivot: str = "block"
    panel_width: int = 384

    def __post_init__(self):
        if self.panel_trail not in ("accurate", "fast"):
            raise ValueError(
                f"panel_trail must be 'accurate' or 'fast', got "
                f"{self.panel_trail!r}"
            )
        if self.panel_width % 128 != 0 or self.panel_width <= 0:
            raise ValueError(
                f"panel_width must be a positive multiple of 128 (the "
                f"Mosaic lane width), got {self.panel_width}"
            )
        if self.panel_pivot not in ("full", "block"):
            raise ValueError(
                f"panel_pivot must be 'full' or 'block', got "
                f"{self.panel_pivot!r}"
            )
        if self.estimator_impl not in ("auto", "einsum", "ozaki"):
            raise ValueError(
                f"estimator_impl must be 'auto', 'einsum' or 'ozaki', got "
                f"{self.estimator_impl!r}"
            )
        if self.factorization not in ("auto", "lu", "gj", "panel"):
            raise ValueError(
                f"factorization must be 'auto', 'lu', 'gj' or 'panel', got "
                f"{self.factorization!r}"
            )
        if self.sweep_method not in ("auto", "lu", "spectral"):
            raise ValueError(
                f"sweep_method must be 'auto', 'lu' or 'spectral', got "
                f"{self.sweep_method!r}"
            )
        if self.estimator not in ("direct", "gram"):
            raise ValueError(
                f"estimator must be 'direct' or 'gram', got {self.estimator!r}"
            )
        if self.orthonormalization not in ("svd", "mgs"):
            raise ValueError(
                f"orthonormalization must be 'svd' or 'mgs', got "
                f"{self.orthonormalization!r}"
            )
        if self.factor_dtype_name not in ("float32", "float64"):
            raise ValueError(
                f"factor_dtype_name must be 'float32' or 'float64', got "
                f"{self.factor_dtype_name!r}"
            )
        if not 0.0 <= self.equally_distributed_reduction_rate < 1.0:
            raise ValueError(
                "equally_distributed_reduction_rate must be in [0, 1)"
            )

    def replace(self, **kw) -> "MorfemConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = MorfemConfig()
