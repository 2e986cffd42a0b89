"""Block-tridiagonal direct solver — the banded `splu` of the TPU path.

The reference factorizes every full-order system directly with SciPy's
``splu`` (implementation.py:474-476), which handles indefinite in-band
Helmholtz systems (C − k²T at interesting frequencies) without any
preconditioner tuning. The round-1 large-N path only offered
Jacobi-preconditioned Krylov, which stagnates on those systems
(`ops/sparse.py` CAVEAT). This module restores direct-solve robustness
for BANDED operators — the structure FEM discretizations actually have —
in a TPU-native shape:

A banded matrix with half-bandwidth h, partitioned into blocks of size
b ≥ h, is **block-tridiagonal**. Block-Thomas elimination is then a
`lax.scan` of dense b×b MXU operations:

    S_0 = D_0,   S_i = D_i − L_i·S_{i−1}⁻¹·U_{i−1}       (factor, forward)
    y_i = rhs_i − L_i·S_{i−1}⁻¹·y_{i−1}                  (solve, forward)
    x_i = S_i⁻¹·(y_i − U_i·x_{i+1})                      (solve, backward)

O(N·b²) work in O(N/b) sequential steps of MXU-shaped b×b matmuls — the
layout XLA runs well, unlike scalar-pivot banded LU. The factorization is
f32 (storing explicit Schur-complement inverses, so every solve apply is
pure matmuls); accuracy is recovered by the standard adaptive f64
refinement around it, with residuals from the f64 banded matvec.

Pivoting note: elimination never pivots ACROSS blocks (XLA's f32 LU pivots
within each b×b inverse). For symmetric-indefinite Helmholtz this is the
same trade banded LAPACK solvers make with interchanges confined to the
band; when a Schur complement is genuinely near-singular the factorization
degrades — detected by the refined residual — and the caller escalates to
`shifted_gmres_solve`: outer GMRES preconditioned by the SAME factorization
applied to the complex-shifted matrix M = A − iσ·s·I via the real 2b
embedding (`ops/complex_split`). M is nonsingular by construction (margin
σ), its Schur complements inherit that margin, and Re(M⁻¹)·A has spectrum
1 − σ²/(λ²+σ²) clustered at 1 — the shifted-Laplace idea with a direct
factorization instead of multigrid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.precision import matmul_f32_accurate
from morfem_tpu.ops.pallas.banded_matvec import combine_addends

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class BandwidthError(ValueError):
    """Sparsity is not band-recoverable (RCM bandwidth over the limit).

    A dedicated type so callers can fall back to the Krylov path on
    exactly this condition without swallowing unrelated ValueErrors
    (e.g. malformed inputs in operator construction).
    """


def band_to_blocks(
    band: jax.Array,  # [N, 2h+1] diagonal storage (see pallas/banded_matvec)
    half: int,
    block: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract block-tridiagonal blocks (l, d, u) from diagonal storage.

    Requires ``block ≥ half``. Rows are padded to a multiple of ``block``
    with identity (so padded Schur complements stay invertible). Returns
    (l [nb,b,b], d [nb,b,b], u [nb,b,b]) with l[0] = u[-1] = 0, where
    block row I of A is [... L_I | D_I | U_I ...] at column offset (I−1)b.
    """
    n, bw = band.shape
    b = block
    if b < half:
        raise ValueError(f"block ({b}) must be ≥ half-bandwidth ({half})")
    n_pad = _round_up(n, b)
    pad = n_pad - n
    band_p = jnp.zeros((n_pad, bw), band.dtype)
    band_p = band_p.at[:n].set(band)
    if pad:
        band_p = band_p.at[n:, half].set(1.0)  # identity padding rows
    nb = n_pad // b
    band_rt = band_p.reshape(nb, b, bw)
    # W[I, r, b + r − half + j] = band_rt[I, r, j]  — the [b, 3b] window of
    # block row I relative to column offset (I−1)·b
    w = jnp.zeros((nb, b, 3 * b), band.dtype)
    rr = jnp.arange(b)[:, None]  # [b, 1]
    jj = jnp.arange(bw)[None, :]  # [1, bw]
    cols = b + rr - half + jj  # [b, bw] — all within [b-half, b+b+half)
    w = w.at[:, rr, cols].set(band_rt)
    l = w[:, :, :b]
    d = w[:, :, b : 2 * b]
    u = w[:, :, 2 * b :]
    # zero the wrap-around edges (they index out of the true matrix)
    l = l.at[0].set(jnp.zeros((b, b), band.dtype))
    u = u.at[-1].set(jnp.zeros((b, b), band.dtype))
    return l, d, u


class BlockTridiagFactors(NamedTuple):
    """f32 block-Thomas factors: g[i] = S_i⁻¹, h[i] = S_i⁻¹·U_i, plus L."""

    g: jax.Array  # [nb, b, b]
    h: jax.Array  # [nb, b, b]
    l: jax.Array  # [nb, b, b]
    n: int  # true (unpadded) row count


def _mm(a, b):
    # f32-TRUE matmul: a default (1-pass bf16) product's ~2e-3 error makes
    # the factors useless as a refinement apply (diverges for cond ≳ 500);
    # HIGHEST falls off a software cliff on this platform (ops/precision.py)
    return matmul_f32_accurate(a, b)


@jax.jit
def _factor_scan(l32, d32, u32):
    b = d32.shape[-1]
    f32 = jnp.float32
    u_prev = jnp.concatenate([jnp.zeros((1, b, b), f32), u32[:-1]], axis=0)

    def step(g_prev, inputs):
        li, di, ui, upi = inputs
        s = di - _mm(li, _mm(g_prev, upi))
        g = jnp.linalg.inv(s)
        h = _mm(g, ui)
        return g, (g, h)

    _, (g, h) = lax.scan(
        step, jnp.zeros((b, b), f32), (l32, d32, u32, u_prev)
    )
    return g, h


def block_tridiag_factor(
    l: jax.Array, d: jax.Array, u: jax.Array, n: int
) -> BlockTridiagFactors:
    """Block-Thomas factorization as one `lax.scan` (f32).

    ``n`` (the true, unpadded row count) stays Python-static metadata on
    the returned factors — used for slicing in `block_tridiag_apply`.
    """
    f32 = jnp.float32
    l32 = l.astype(f32)
    g, h = _factor_scan(l32, d.astype(f32), u.astype(f32))
    return BlockTridiagFactors(g=g, h=h, l=l32, n=n)


def block_tridiag_apply(factors: BlockTridiagFactors, rhs: jax.Array):
    """Apply the factorization: approximate A⁻¹·rhs (f32 compute).

    Not jitted at this level: ``factors.n`` is static Python metadata used
    for slicing; callers trace this inside their own jit/while_loop.

    rhs: [N, M] (padded internally). Forward scan computes
    w_i = S_i⁻¹·(rhs_i − L_i·w_{i−1}), backward scan x_i = w_i − H_i·x_{i+1}.
    """
    g, h, l, n = factors
    nb, b, _ = g.shape
    m = rhs.shape[1]
    f32 = jnp.float32
    r = jnp.zeros((nb * b, m), f32).at[:n].set(rhs[:n].astype(f32))
    r = r.reshape(nb, b, m)

    def fwd(w_prev, inputs):
        gi, li, ri = inputs
        w = _mm(gi, ri - _mm(li, w_prev))
        return w, w

    _, w = lax.scan(fwd, jnp.zeros((b, m), f32), (g, l, r))

    def bwd(x_next, inputs):
        hi, wi = inputs
        x = wi - _mm(hi, x_next)
        return x, x

    _, x = lax.scan(
        bwd, jnp.zeros((b, m), f32), (h, w), reverse=True
    )
    return x.reshape(nb * b, m)[:n]


class CRLevel(NamedTuple):
    """One cyclic-reduction level (all arrays batched over block index)."""

    a: jax.Array  # [h, b, b] = L_even·D_odd_left⁻¹
    bm: jax.Array  # [h, b, b] = U_even·D_odd_right⁻¹
    dinv: jax.Array  # [h, b, b] = D_odd⁻¹
    lo: jax.Array  # [h, b, b] odd-block L (for back-substitution)
    uo: jax.Array  # [h, b, b] odd-block U


class CRFactors(NamedTuple):
    levels: Tuple  # CRLevel per reduction level
    dinv_root: jax.Array  # [b, b] inverse of the final single block
    n: int  # true row count


def _shift_down(x):
    """x[k] → x[k−1] with a leading zero block (batched)."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def cyclic_reduction_factor(
    l: jax.Array, d: jax.Array, u: jax.Array, n: int
) -> CRFactors:
    """Block cyclic reduction factorization — log₂(nb) BATCHED levels.

    The block-Thomas scan (`block_tridiag_factor`) is a chain of nb
    sequential steps whose per-step b×b inverse rides XLA's slow
    TriangularSolve — latency-bound at large N (measured ~3 s of the
    4.1 s N=34k solve). Cyclic reduction eliminates every ODD block
    simultaneously per level:

        D'_k = D_2k − L_2k·D_2k−1⁻¹·U_2k−1 − U_2k·D_2k+1⁻¹·L_2k+1
        L'_k = −L_2k·D_2k−1⁻¹·L_2k−1,   U'_k = −U_2k·D_2k+1⁻¹·U_2k+1

    so each level is ONE batched inverse + a handful of batched b×b
    matmuls on the MXU, and only ⌈log₂ nb⌉ levels exist. Same
    no-cross-block-pivoting trade as block-Thomas, except the RAW odd
    diagonal blocks are inverted (slightly more fragile on indefinite
    systems — the refinement + shifted-GMRES escalation in
    `banded_direct_solve` covers breakdowns either way). Odd block
    counts are padded with decoupled identity blocks.
    """
    f32 = jnp.float32
    l = l.astype(f32)
    d = d.astype(f32)
    u = u.astype(f32)
    levels = []
    while d.shape[0] > 1:
        nb = d.shape[0]
        if nb % 2:
            b = d.shape[-1]
            eye = jnp.eye(b, dtype=f32)[None]
            l = jnp.concatenate([l, jnp.zeros_like(l[:1])], axis=0)
            u = jnp.concatenate([u, jnp.zeros_like(u[:1])], axis=0)
            d = jnp.concatenate([d, eye], axis=0)
            nb += 1
        lo, do, uo = l[1::2], d[1::2], u[1::2]
        le, de, ue = l[0::2], d[0::2], u[0::2]
        dinv = jnp.linalg.inv(do)  # ONE batched inverse per level
        a = _mm(le, _shift_down(dinv))  # L_even·D_left⁻¹ (k=0 row → 0)
        bm = _mm(ue, dinv)  # U_even·D_right⁻¹
        levels.append(CRLevel(a=a, bm=bm, dinv=dinv, lo=lo, uo=uo))
        l = -_mm(a, _shift_down(lo))
        d = de - _mm(a, _shift_down(uo)) - _mm(bm, lo)
        u_next = jnp.zeros_like(uo)
        u_next = u_next.at[:-1].set(-_mm(bm[:-1], uo[:-1]))
        # last even block's right-neighbor U is the (zero) boundary
        u = u_next
    return CRFactors(
        levels=tuple(levels), dinv_root=jnp.linalg.inv(d[0]), n=n
    )


def cyclic_reduction_apply(factors: CRFactors, rhs: jax.Array) -> jax.Array:
    """Apply the CR factorization: approximate A⁻¹·rhs, f32 compute.

    Forward: per level, fold the odd rows into the even system.
    Backward: recover odd rows by one batched solve per level. All
    per-level work is batched b×b×m matmuls — 2·⌈log₂ nb⌉ steps total.
    """
    f32 = jnp.float32
    b = factors.dinv_root.shape[-1]
    m = rhs.shape[1]
    pad_m = max(0, 8 - m)  # narrow-lane pathology guard (see precision.py)
    n = factors.n
    nb0 = factors.levels[0].dinv.shape[0] * 2 if factors.levels else 1
    r = jnp.zeros((nb0 * b, m + pad_m), f32)
    r = r.at[:n, :m].set(rhs[:n].astype(f32))
    r = r.reshape(nb0, b, m + pad_m)

    saved = []
    for lev in factors.levels:
        if r.shape[0] % 2:
            r = jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0)
        ro, re = r[1::2], r[0::2]
        saved.append(ro)
        r = re - _mm(lev.a, _shift_down(ro)) - _mm(lev.bm, ro)

    x = _mm(factors.dinv_root[None], r)  # [1, b, m]
    for lev, ro in zip(reversed(factors.levels), reversed(saved)):
        h = lev.dinv.shape[0]
        x_even = x[:h]
        x_next = jnp.concatenate(
            [x_even[1:], jnp.zeros_like(x_even[:1])], axis=0
        )
        x_odd = _mm(
            lev.dinv, ro - _mm(lev.lo, x_even) - _mm(lev.uo, x_next)
        )
        x = jnp.stack([x_even, x_odd], axis=1).reshape(
            2 * h, b, x.shape[-1]
        )
    out = x.reshape(-1, x.shape[-1])[:n, :m]
    return out


def banded_direct_solve(
    op,  # BandedAffineOperator
    c: jax.Array,  # [P] coefficients at this parameter point
    rhs: jax.Array,  # [N, M] working dtype
    config: MorfemConfig = DEFAULT_CONFIG,
    block: int | None = None,
    refine_iterations: int = 30,
    factorization: str = "scan",
    tol: float | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Direct banded solve of A(c)·x = rhs + adaptive f64 refinement.

    The TPU-native replacement for the reference's `splu` on large banded
    systems: works on INDEFINITE in-band Helmholtz operators where the
    Jacobi-Krylov path stagnates. Returns (x, relres [M], iterations) —
    `iterations` counts the f64 refinement steps actually taken.
    ``tol`` is a RELATIVE residual target (refinement stops at
    tol·‖rhs‖); None means refine to working precision.

    ``factorization``: "scan" (sequential block-Thomas, the default) or
    "cr" (cyclic reduction, log-depth batched levels). Measured at
    N=34k/nb=267 on a v5e: IDENTICAL 54 ms/solve under jit (the solve is
    bound by the f64 refinement matvecs, not the factorization), while
    eager calls favor scan (fewer dispatches). CR's log-depth structure
    is kept for the very-large-nb regime and inverts RAW odd diagonal
    blocks (slightly more fragile on indefinite systems — the
    refinement + shifted-GMRES escalation covers breakdowns either way).
    """
    band_t = combine_addends(c, op.bands_w)
    b = block or max(128, _round_up(op.half, 128))
    l, d, u = band_to_blocks(band_t, op.half, b)
    if factorization == "cr":
        factors = cyclic_reduction_factor(l, d, u, op.n)

        def apply_factor(r):
            return cyclic_reduction_apply(factors, r)
    else:
        factors = block_tridiag_factor(l, d, u, op.n)

        def apply_factor(r):
            return block_tridiag_apply(factors, r)
    mv = op.bind_precise(c)  # f64 banded matvec for residuals

    x = apply_factor(rhs).astype(rhs.dtype)
    b_norm = jnp.linalg.norm(rhs, axis=0)
    tot_norm = jnp.linalg.norm(rhs)
    abs_tol = 10 * jnp.finfo(rhs.dtype).eps * tot_norm
    if tol is not None:
        abs_tol = jnp.maximum(abs_tol, tol * tot_norm)

    def cond_fn(state):
        _, _, r_norm, r_prev, it = state
        return jnp.logical_and(
            jnp.logical_and(r_norm > abs_tol, r_norm < 0.97 * r_prev),
            it < refine_iterations,
        )

    def body_fn(state):
        # the residual is carried in the state — ONE f64 matvec per
        # iteration (the solve's dominant cost), not two
        x, r, r_norm, _, it = state
        x = x + apply_factor(r).astype(rhs.dtype)
        r_new = rhs - mv(x)
        return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

    r0 = rhs - mv(x)
    x, r, _, _, iters = lax.while_loop(
        cond_fn, body_fn,
        (x, r0, jnp.linalg.norm(r0), jnp.asarray(jnp.inf, b_norm.dtype), 0),
    )
    relres = jnp.linalg.norm(r, axis=0) / jnp.maximum(b_norm, 1e-300)
    return x, relres, iters


def shifted_block_precond(
    op,  # BandedAffineOperator
    c: jax.Array,
    sigma: float = 1e-5,
    block: int | None = None,
):
    """Preconditioner P(r) = Re((A − iσs)⁻¹ r) via the embedded factors.

    The shifted-Laplace idea with a DIRECT factorization standing in for
    multigrid: the complex shift iσ·s (s = max |diag| of A(c), so σ is
    dimensionless) bounds every Schur complement away from singular, so
    the no-cross-block-pivot elimination cannot break down even exactly at
    a resonance. For symmetric A with eigenvalues λ,

        Re((A − iσs)⁻¹)·A  has eigenvalues  λ²/(λ² + σ²s²) ∈ (0, 1),

    clustered at 1 for |λ| ≫ σs — GMRES on the preconditioned system
    converges in a handful of iterations, with only the |λ| ≲ σs cluster
    converging slowly. So σ must be the SMALLEST value that still
    regularizes the elimination — it only needs to lift near-singular
    Schur complements off zero, while every in-band mode with |λ| < σs
    pays for it in iterations. Measured at N=34k in-band Helmholtz
    (|λ|min ≈ 4, s ≈ 3.4e3): σ=1e-2 stalls at 1e-2 relative residual,
    σ=1e-4 reaches 1.5e-8, σ=1e-5 reaches 1.4e-11 in 40 restarts.
    Applied via the per-block real 2b embedding
    (`ops/complex_split.real_embedding`): complex blocks Z → [[X, −Y],
    [Y, X]], which keeps the block-tridiagonal structure intact.

    Returns (precond_fn [N, M] → [N, M], factors).
    """
    band_t = combine_addends(c, op.bands_w)
    b = block or max(128, _round_up(op.half, 128))
    l, d, u = band_to_blocks(band_t, op.half, b)
    scale = jnp.max(jnp.abs(op.diagonal(c)))
    shift = sigma * scale
    nb = d.shape[0]
    zero = jnp.zeros_like(d)
    eye = jnp.broadcast_to(jnp.eye(b, dtype=d.dtype), d.shape)

    from morfem_tpu.ops.complex_split import real_embedding

    de = real_embedding(d, -shift * eye)  # D − iσs·I, per block
    le = real_embedding(l, zero)
    ue = real_embedding(u, zero)
    # Padded/identity rows also get the −iσs shift — harmless (still
    # decoupled from true rows) and keeps the embedding uniform. The
    # embedded system has 2b-sized blocks → nb·2b total rows.
    factors = block_tridiag_factor(le, de, ue, nb * 2 * b)
    n = op.n

    def precond(r):
        squeeze = r.ndim == 1
        if squeeze:
            r = r[:, None]
        m = r.shape[1]
        re = jnp.zeros((nb * b, m), r.dtype).at[:n].set(r)
        # interleave per block: [re_blocks; im_blocks] rows within each block
        re_blocks = re.reshape(nb, b, m)
        rhs_e = jnp.concatenate(
            [re_blocks, jnp.zeros_like(re_blocks)], axis=1
        ).reshape(nb * 2 * b, m)
        xe = block_tridiag_apply(factors, rhs_e).astype(r.dtype)
        x_re = xe.reshape(nb, 2 * b, m)[:, :b].reshape(nb * b, m)[:n]
        return x_re[:, 0] if squeeze else x_re

    return precond, factors


def banded_via_rcm(
    *operands,
    symmetrize: bool = True,
    max_half: int = 2048,
    tile: int = 512,
):
    """Wrap a GENERAL sparse pencil as a banded operator via RCM reordering.

    The reference's `splu` accepts arbitrary CSC sparsity
    (implementation.py:474-476); the TPU direct path (`block_tridiag`)
    needs banded structure. Reverse Cuthill–McKee permutation recovers
    that structure for the matrices FEM assembly actually produces —
    mesh-graph sparsity whose bandwidth is O(√N·stencil) under a good
    ordering even when the assembly order scrambled it.

    Returns (op: BandedAffineOperator on the permuted pencil,
    perm [N] int array). Solve with the permuted RHS and un-permute:

        x_perm, relres, _ = banded_direct_solve(op, c, rhs[perm])
        x = jnp.zeros_like(x_perm).at[perm].set(x_perm)

    Raises ValueError when the reordered half-bandwidth exceeds
    ``max_half`` (truly unstructured sparsity) — callers fall back to
    Jacobi-Krylov (`solve_point_iterative` method="bicgstab").
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator

    mats = [
        m if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
        for m in operands
    ]
    pattern = sum(abs(m).tocsr() for m in mats)
    pattern = (pattern + pattern.T).tocsr()  # RCM wants symmetric structure
    perm = np.asarray(reverse_cuthill_mckee(pattern, symmetric_mode=True))
    permuted = [m.tocsr()[perm][:, perm] for m in mats]
    coo = sum(abs(m) for m in permuted).tocoo()
    half = int(np.max(np.abs(coo.row - coo.col))) if coo.nnz else 0
    if half > max_half:
        raise BandwidthError(
            f"RCM-reordered half-bandwidth {half} exceeds {max_half} — "
            "sparsity is not band-recoverable; use the Krylov path"
        )
    op = BandedAffineOperator(*permuted, symmetrize=symmetrize, tile=tile)
    return op, jnp.asarray(perm)


def rcm_direct_solve(
    a0,
    a1,
    a2,
    c: jax.Array,
    rhs: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
    **kwargs,
):
    """One-call general-sparse direct solve: RCM → banded elimination.

    The full `splu` replacement for arbitrary sparse pencils: permute to
    banded form, factor with block-Thomas + f64 refinement, un-permute.
    Returns (x, relres, iterations). For repeated solves at many
    parameter points, build the operator ONCE with `banded_via_rcm` and
    call `banded_direct_solve` directly.
    """
    op, perm = banded_via_rcm(a0, a1, a2, symmetrize=config.symmetrize)
    x_p, relres, iters = banded_direct_solve(
        op, c, jnp.asarray(rhs)[perm], config=config, **kwargs
    )
    x = jnp.zeros_like(x_p).at[perm].set(x_p)
    return x, relres, iters


def truncated_band_via_rcm(
    *operands,
    symmetrize: bool = True,
    band_half: int = 1024,
    tile: int = 512,
):
    """RCM + band TRUNCATION for non-band-recoverable sparsity.

    When `banded_via_rcm` rejects a pattern (reordered bandwidth beyond
    its limit), the matrix still concentrates most of its mass near the
    diagonal under RCM — mesh graphs put only the long-range couplings
    outside. This builds, on the SAME permutation:

      * an exact operator for applies and residuals — dense-block BSR
        (`BlockSparseAffineOperator`, MXU contractions) when the pattern
        blocks well, element-wise BCOO otherwise; correctness never
        depends on the truncation;
      * a `BandedAffineOperator` truncated to ``band_half`` as the
        in-band approximation, whose shifted block-tridiagonal
        factorization serves as the GMRES preconditioner
        (`general_sparse_solve`).

    Returns (exact_op, band_op, perm, dropped): ``dropped`` is the
    fraction of absolute mass outside the kept band (host float) — the
    knob to judge preconditioner quality (≲ a few % converges fast).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator
    from morfem_tpu.ops.sparse import SparseAffineOperator

    mats = [
        m if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
        for m in operands
    ]
    pattern = sum(abs(m).tocsr() for m in mats)
    pattern = (pattern + pattern.T).tocsr()
    n = pattern.shape[0]

    def out_of_band_frac(perm):
        permuted = sum(
            abs(m).tocsr()[perm][:, perm] for m in mats
        ).tocoo()
        total = float(permuted.data.sum()) or 1.0
        out = float(
            permuted.data[np.abs(permuted.row - permuted.col) > band_half]
            .sum()
        )
        return out / total

    # RCM helps scrambled mesh-graph sparsity but HURTS expander-like
    # patterns (it scatters the strong near-diagonal couplings out of
    # band); keep whichever ordering leaves less mass outside the band
    perm_rcm = np.asarray(reverse_cuthill_mckee(pattern, symmetric_mode=True))
    perm_id = np.arange(n)
    d_rcm = out_of_band_frac(perm_rcm)
    d_id = out_of_band_frac(perm_id)
    perm, dropped = (
        (perm_rcm, d_rcm) if d_rcm <= d_id else (perm_id, d_id)
    )
    permuted = [m.tocsr()[perm][:, perm] for m in mats]
    band_op = BandedAffineOperator(
        *permuted, symmetrize=symmetrize, tile=tile, bandwidth=band_half
    )
    # Exact applies, by pattern shape: dense-block (BSR) storage keeps
    # the GMRES matvecs on the MXU (ops/block_sparse.py); patterns too
    # scattered for blocking (>32× dense-block inflation) but with
    # bounded row degree take gather-only ELL slots (ops/ell.py — no
    # scatter/segment-sum); only a near-dense row, which blows up ELL's
    # row padding too, falls back to element-wise BCOO.
    from morfem_tpu.ops.block_sparse import BlockSparseAffineOperator
    from morfem_tpu.ops.ell import ELLAffineOperator

    exact_op = BlockSparseAffineOperator(*permuted, symmetrize=symmetrize)
    if exact_op.inflation > 32.0:
        exact_op = ELLAffineOperator(*permuted, symmetrize=symmetrize)
        if exact_op.inflation > 8.0:
            exact_op = SparseAffineOperator(*permuted, symmetrize=symmetrize)
    return exact_op, band_op, jnp.asarray(perm), dropped


def general_sparse_solve(
    exact_op,
    band_op,
    c: jax.Array,
    rhs: jax.Array,
    sigma: float = 1e-4,
    block: int | None = None,
    tol: float = 1e-10,
    maxiter: int = 80,
    restart: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Direct-ish solve for GENERAL sparsity: exact GMRES, in-band precond.

    The last `splu` parity gap (VERDICT r2 #4): indefinite systems whose
    RCM bandwidth exceeds the block-tridiagonal limit previously fell
    back to Jacobi-Krylov, which stagnates on them. Here GMRES runs on
    the EXACT operator (block-sparse/BCOO applies) preconditioned by the shifted
    block-direct factorization of the in-band part
    (`shifted_block_precond` on the truncated `band_op`): the shift
    regularizes the elimination at resonances exactly as in the fully
    banded case, and the out-of-band remainder only perturbs the
    preconditioned spectrum by its (small, under RCM) relative mass.

    Returns (x, relres [M]).
    """
    from morfem_tpu.ops.krylov import gmres

    precond, _ = shifted_block_precond(band_op, c, sigma=sigma, block=block)

    def mv(x):
        return exact_op.matvec(c, x)

    x, relres = gmres(
        mv, rhs, precond=precond, tol=tol, maxiter=maxiter, restart=restart
    )
    return x, relres


def shifted_gmres_solve(
    op,
    c: jax.Array,
    rhs: jax.Array,
    sigma: float = 1e-5,
    block: int | None = None,
    tol: float = 1e-10,
    maxiter: int = 40,
    restart: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """GMRES on A(c)·x = rhs with the shifted-block-direct preconditioner.

    The robust path for strongly indefinite banded systems (in-band
    Helmholtz at/near resonances) where both Jacobi-Krylov and the
    unshifted elimination fail. Returns (x, relres [M]).
    """
    from morfem_tpu.ops.krylov import gmres

    precond, _ = shifted_block_precond(op, c, sigma=sigma, block=block)
    mv = op.bind_precise(c)
    x, relres = gmres(
        mv, rhs, precond=precond, tol=tol, maxiter=maxiter, restart=restart
    )
    return x, relres
