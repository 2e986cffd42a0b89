"""Blocked panel LU at MXU rates — the dense `splu` replacement.

The reference's full-order sweep factorizes one sparse N×N system per
frequency point with `splu` (implementation.py:474-476; dense fallback
`lu_factor` :477-478). On TPU the round-2 state of this path was XLA's
`LuDecomposition` at ~0.6 TFLOP/s effective (~1% of the chip) — the
single largest perf gap the round-2 verdict flagged. This module is the
TPU-native design:

  * right-looking blocked LU with partial pivoting, no row swaps: the
    sequential panel factorization runs as ONE Pallas kernel per panel
    (`ops/pallas/panel_factor.py`), entirely in VMEM;
  * all O(N³) trailing work is rank-P GEMM updates executed f32-TRUE via
    bf16 multi-word MXU passes (`ops/precision.py::matmul_f32_accurate`);
  * the pivot permutation is applied once at the end with a single row
    gather, recovering the textbook compact LU; the 128×128 diagonal
    blocks of L and U are pre-inverted (one batched f32 inverse) so both
    triangular solves are scans of batched matmuls — XLA's slow
    `TriangularSolve` never runs;
  * everything is batched over the frequency-point axis: one kernel
    grid / one GEMM serves a whole chunk of systems.

`solve_sweep_panel` adds the sweep-level refinement redesign: instead of
per-point f64 residual matvecs (narrow [N,M] RHS, bandwidth-bound), the
residual of a whole chunk is computed against the three SHARED affine
operators A_p — three wide Ozaki matmuls per iteration serve every point
in the chunk at once (the affine structure the reference's
`system_matrix`, implementation.py:526-528, makes available).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.pallas.panel_factor import panel_factor
from morfem_tpu.ops.pallas.fused_mm import fusable, mm_words
from morfem_tpu.ops.pallas.row_gather import gather_rows
from morfem_tpu.ops.precision import matmul_f32_accurate

_HI = jax.lax.Precision.HIGHEST
PANEL = 128


def _mm_true(c, r, t=None, sign=1):
    """f32-true c@r (+t, ×sign): fused one-output-pass Pallas kernel when
    the shape qualifies (`fused_mm.fusable`), XLA 6-pass otherwise.

    The fused path cuts the trailing-update HBM traffic to the matmul
    minimum — on-chip A/B at [16,3072,384]@[16,384,3072]: 29.2 ms vs
    37.8 ms XLA, with larger relative wins at the smaller shrinking-W
    steps (round 3 probe: the 6-vs-3-pass delta was ~103 ms/chunk,
    i.e. accumulation-bandwidth-bound).
    """
    if fusable(*c.shape[-2:], r.shape[-1]):
        return mm_words(c, r, t, sign=sign)
    out = matmul_f32_accurate(c, r)
    if t is None:
        return out if sign > 0 else -out
    return t + sign * out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def full_pivot_panel(n: int, panel: int) -> int:
    """Effective panel width for the FULL-pivot factor (VMEM clamp).

    The full-pivot Pallas kernel holds ~5 P×Npl f32 buffers per program
    (panel + coefficients, in/out/scratch). At P=256, N≈3.4k that is
    ~18 MB > the 16 MB VMEM — fall back to the 128 base width when a
    wider panel would not fit (the block-pivot variant sees only [P, P]
    diagonal blocks and takes the requested width as-is).
    """
    if panel > PANEL and 5 * panel * _round_up(n, panel) * 4 > 12 << 20:
        return PANEL
    return panel


def _unit_lower_inv(l: jax.Array, base: int = 32) -> jax.Array:
    """Inverse of batched unit-lower-triangular blocks: recursion + log-squaring.

    `jnp.linalg.inv` on [G, nb, 128, 128] costs ~30 ms per factor chunk
    on this chip (LU + TriangularSolve per block). The 2×2 block
    recursion [[L11,0],[L21,L22]]⁻¹ = [[L11⁻¹,0],[−L22⁻¹L21L11⁻¹,L22⁻¹]]
    is all batched matmuls; at ``base`` the remaining block is inverted
    by the telescoped Neumann product (L = I − N, N nilpotent):

        L⁻¹ = (I + N)(I + N²)(I + N⁴)…        — exact: every Σ N^i term
                                                appears exactly once.

    Both knobs are compile/accuracy trade-offs measured round 3 (the
    unrolled per-panel-step inverses dominate `panel_lu_factor_block`'s
    XLA compile): recursion to an 8×8 series base compiled in 67 s;
    pure log-squaring at s=128 compiles in ~10 s but loses ~5 digits on
    real pivoted factors (intermediate N^(2^j) powers grow to ~1e3
    before cancelling — measured |L⁻¹L−I| 9.8e-2); recursion to a
    base-32 log-squared core keeps |L⁻¹L−I| ≈ 5e-6 (the recursion's
    class) and compiles in ~13 s.
    """
    s = l.shape[-1]
    mm = lambda a, b: jnp.einsum(  # noqa: E731
        "...ij,...jk->...ik", a, b, precision=_HI
    )
    if s <= base:
        eye = jnp.eye(s, dtype=l.dtype)
        n_pow = -jnp.tril(l, -1)  # N^(2^j), starting at j=0
        out = jnp.broadcast_to(eye, l.shape) + n_pow
        for _ in range(max(0, (s - 1).bit_length() - 1)):
            n_pow = mm(n_pow, n_pow)
            out = out + mm(out, n_pow)  # out·(I + N^(2^j))
        return out
    h = s // 2
    l11 = _unit_lower_inv(l[..., :h, :h], base)
    l22 = _unit_lower_inv(l[..., h:, h:], base)
    off = -mm(l22, mm(l[..., h:, :h], l11))
    top = jnp.concatenate([l11, jnp.zeros_like(l[..., :h, h:])], axis=-1)
    bot = jnp.concatenate([off, l22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _upper_inv(u: jax.Array) -> jax.Array:
    """Inverse of batched upper-triangular blocks (non-unit diagonal)."""
    d = jnp.diagonal(u, axis1=-2, axis2=-1)
    un = u / d[..., :, None]  # unit upper
    un_inv = jnp.swapaxes(
        _unit_lower_inv(jnp.swapaxes(un, -1, -2)), -1, -2
    )
    return un_inv / d[..., None, :]


class PanelLUFactors(NamedTuple):
    """Batched compact LU with pre-inverted diagonal blocks (f32).

    lug:  [G, Np, Np] — compact LU in textbook order (unit-lower L below
          the diagonal, U on/above), rows already permuted.
    perm: [G, Np] int32 — pivot order; solve with `rhs[perm]`.
    linv: [G, nb, P, P] — inverses of the unit-lower diagonal blocks.
    uinv: [G, nb, P, P] — inverses of the upper diagonal blocks.
    dinv: [G, Np] — row-equilibration reciprocals folded into the solve.
    n:    true (unpadded) dimension, static.
    """

    lug: jax.Array
    perm: jax.Array
    linv: jax.Array
    uinv: jax.Array
    dinv: jax.Array
    n: int


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def panel_lu_factor(
    a: jax.Array,
    interpret: bool | None = None,
    trail: str = "f32x6",
    panel: int = PANEL,
) -> PanelLUFactors:
    """Factor a batch of real square systems: [G, N, N] → PanelLUFactors.

    f32 compute throughout (callers refine in the working dtype, exactly
    like `lu_solve_refined`). Rows are equilibrated to unit max first —
    pivots stay O(1), matching `gj_inverse_f32`'s absorption guard.

    `trail` picks the precision of the O(N³) trailing updates:
      * "f32x6" — f32-true 3-word bf16 splits (6 MXU passes, ~1e-7
        factor quality). Safe at any conditioning f64 refinement can
        absorb; the default.
      * "f32x3" — XLA `Precision.HIGH` (bf16x3, ~1.3e-5) with 2-word
        pivot-row extraction: ~1.6× faster factor. The refinement
        contraction rate degrades from ~cond·1e-7 to ~cond·1e-5 per
        iteration, so this is for well-conditioned sweeps (the caller
        measures/escalates; see `solve_sweep_panel`).
    """
    if trail not in ("f32x6", "f32x3"):
        raise ValueError(f"trail must be 'f32x6' or 'f32x3', got {trail!r}")
    if panel % 128:
        raise ValueError(
            f"panel must be a multiple of 128 (the row_gather DMA kernel's "
            f"P contract and the MXU tile), got panel={panel}"
        )
    if interpret is None:
        interpret = _interpret_default()
    if a.ndim == 2:
        a = a[None]
    g, n, n2 = a.shape
    if n != n2:
        raise ValueError(f"square systems required, got {a.shape}")
    panel = full_pivot_panel(n, panel)
    np_ = _round_up(n, panel)
    nb = np_ // panel

    a32 = a.astype(jnp.float32)
    d = jnp.max(jnp.abs(a32), axis=-1)  # [G, N]
    d = jnp.where(d == 0, 1.0, d)
    a32 = a32 / d[..., None]
    dinv = jnp.ones((g, np_), jnp.float32).at[:, :n].set(1.0 / d)
    if np_ != n:
        pad = np_ - n
        a32 = jnp.pad(a32, ((0, 0), (0, pad), (0, pad)))
        eye_idx = jnp.arange(n, np_)
        a32 = a32.at[:, eye_idx, eye_idx].set(1.0)

    # single-trail layout: factor the leading panel of the remaining
    # columns, apply ONE one-hot row extraction + ONE rank-P GEMM to the
    # (statically shrinking) rest — big MXU ops, no per-block gathers
    rest = a32
    avail = jnp.ones((g, np_), jnp.float32)
    done = []
    pivs = []
    for k in range(nb):
        panel_t = jnp.swapaxes(rest[:, :, :panel], 1, 2)  # [G, P, Np]
        fac_t, c_t, piv, avail = panel_factor(panel_t, avail,
                                              interpret=interpret)
        done.append(jnp.swapaxes(fac_t, 1, 2))
        pivs.append(piv)
        if k + 1 < nb:
            tr = rest[:, :, panel:]
            # pivot rows via the DMA gather kernel: exact at any trail
            # (the one-hot MXU extraction it replaces cost 2-3 full bf16
            # passes over the trailing block plus a 3-word HBM split —
            # ~half the trailing update's FLOPs spent moving 128 rows)
            rows = gather_rows(tr, piv, interpret=interpret)  # [G, P, W]
            cmat = jnp.swapaxes(c_t, 1, 2)  # [G, Np, P]
            if trail == "f32x6":
                rest = _mm_true(cmat, rows, t=tr)
            else:
                rest = tr + jnp.matmul(
                    cmat, rows, precision=jax.lax.Precision.HIGH
                )

    perm = jnp.concatenate(pivs, axis=1)  # [G, Np]
    m_fac = jnp.concatenate(done, axis=2)  # [G, Np, Np]
    lug = gather_rows(m_fac, perm, interpret=interpret)

    diag = jnp.stack(
        [lug[:, k * panel : (k + 1) * panel, k * panel : (k + 1) * panel]
         for k in range(nb)],
        axis=1,
    )  # [G, nb, P, P]
    eye = jnp.eye(panel, dtype=jnp.float32)
    l_diag = jnp.tril(diag, -1) + eye
    u_diag = jnp.triu(diag)
    linv = _unit_lower_inv(l_diag)
    uinv = _upper_inv(u_diag)
    return PanelLUFactors(lug=lug, perm=perm, linv=linv, uinv=uinv,
                          dinv=dinv, n=n)


def panel_lu_factor_block(
    a: jax.Array,
    interpret: bool | None = None,
    trail: str = "f32x6",
    panel: int = PANEL,
) -> PanelLUFactors:
    """Blocked LU with BLOCK-LOCAL pivoting — the GEMM-only fast factor.

    `panel_lu_factor` runs partial pivoting over ALL remaining rows, which
    costs three things the MXU cannot help with (measured at N=3411,
    G=16): the full-height Pallas panel kernel (~9.5 ms/matrix — 128
    sequential column steps over Np lanes), the trailing pivot-row
    extraction (~4 ms), and the final full-matrix permutation gather
    (~2 ms). This variant pivots only WITHIN each 128-row diagonal block
    (classic block/pairwise pivoting):

        P_k·D = L11·U11  (local 128×128 factor, Pallas kernel at 128
                          lanes — ~27× less column-step work)
        U12 = L11⁻¹·P_k·A12,  L21 = A21·U11⁻¹   (pre-inverted diagonal
                          blocks: pure GEMMs, no TriangularSolve)
        S   = A22 − L21·U12                      (f32-true trailing GEMM)

    so every O(N³) FLOP is a big GEMM and no cross-block row movement
    exists (perm is block-local; the factor assembles directly in
    textbook order). Numerically this is weaker than partial pivoting —
    element growth is unbounded when a diagonal block is ill-conditioned
    even after local pivoting — so callers MUST verify residuals and
    escalate to `panel_lu_factor` on stagnation (`solve_sweep_panel`
    does, the same pattern as the fast-trail escalation). Returns the
    same `PanelLUFactors` contract; `panel_lu_apply` works unchanged.
    """
    if trail not in ("f32x6", "f32x3"):
        raise ValueError(f"trail must be 'f32x6' or 'f32x3', got {trail!r}")
    if panel % 128:
        raise ValueError(
            f"panel must be a multiple of 128 (the row_gather DMA kernel's "
            f"P contract and the MXU tile), got panel={panel}"
        )
    if interpret is None:
        interpret = _interpret_default()
    if a.ndim == 2:
        a = a[None]
    g, n, n2 = a.shape
    if n != n2:
        raise ValueError(f"square systems required, got {a.shape}")
    np_ = _round_up(n, panel)
    nb = np_ // panel

    a32 = a.astype(jnp.float32)
    d = jnp.max(jnp.abs(a32), axis=-1)
    d = jnp.where(d == 0, 1.0, d)
    a32 = a32 / d[..., None]
    dinv = jnp.ones((g, np_), jnp.float32).at[:, :n].set(1.0 / d)
    if np_ != n:
        pad = np_ - n
        a32 = jnp.pad(a32, ((0, 0), (0, pad), (0, pad)))
        eye_idx = jnp.arange(n, np_)
        a32 = a32.at[:, eye_idx, eye_idx].set(1.0)

    if trail == "f32x6":
        mmt = _mm_true

        def mmt_sub(t, x, y):  # t − x@y, one output pass when fusable
            return _mm_true(x, y, t=t, sign=-1)
    else:
        def mmt(x, y):
            return jnp.matmul(x, y, precision=jax.lax.Precision.HIGH)

        def mmt_sub(t, x, y):
            return t - mmt(x, y)

    def take(m, i):  # batched row gather, DMA kernel (see row_gather.py)
        return gather_rows(m, i, interpret=interpret)

    eye = jnp.eye(panel, dtype=jnp.float32)
    ones_avail = jnp.ones((g, panel), jnp.float32)
    out = jnp.zeros((g, np_, np_), jnp.float32)
    rest = a32
    linvs, uinvs, pivs = [], [], []
    for k in range(nb):
        d_t = jnp.swapaxes(rest[:, :panel, :panel], 1, 2)  # [G, Pc, Pr]
        fac_t, _c, piv, _av = panel_factor(d_t, ones_avail,
                                           interpret=interpret)
        fac = jnp.swapaxes(fac_t, 1, 2)  # [G, Pr, Pc]
        lu_d = take(fac, piv)  # compact textbook LU of P_k·D
        l11 = jnp.tril(lu_d, -1) + eye
        u11 = jnp.triu(lu_d)
        linv = _unit_lower_inv(l11)
        uinv = _upper_inv(u11)
        if k > 0:
            # the local pivot also reorders this block band's already-
            # written L21 rows (LAPACK's laswp across the factored left
            # part); columns ≥ k·P are overwritten below anyway
            band = lax.dynamic_slice(
                out, (0, k * panel, 0), (g, panel, np_)
            )
            out = lax.dynamic_update_slice(
                out, take(band, piv), (0, k * panel, 0)
            )
        if k + 1 < nb:
            a12p = take(rest[:, :panel, panel:], piv)  # [G, P, W]
            u12 = mmt(linv, a12p)
            l21 = mmt(rest[:, panel:, :panel], uinv)  # [G, W, P]
            rest = mmt_sub(rest[:, panel:, panel:], l21, u12)
            row_block = jnp.concatenate([lu_d, u12], axis=2)
            out = lax.dynamic_update_slice(
                out, row_block, (0, k * panel, k * panel)
            )
            out = lax.dynamic_update_slice(
                out, l21, (0, (k + 1) * panel, k * panel)
            )
        else:
            out = lax.dynamic_update_slice(
                out, lu_d, (0, k * panel, k * panel)
            )
        linvs.append(linv)
        uinvs.append(uinv)
        pivs.append(k * panel + piv)

    return PanelLUFactors(
        lug=out,
        perm=jnp.concatenate(pivs, axis=1),
        linv=jnp.stack(linvs, axis=1),
        uinv=jnp.stack(uinvs, axis=1),
        dinv=dinv,
        n=n,
    )


def panel_lu_apply(f: PanelLUFactors, rhs: jax.Array) -> jax.Array:
    """Approximate A⁻¹·rhs from the f32 factors; rhs [G, N, M] any float.

    Both triangular phases are `lax.scan`s of batched MXU matmuls with
    pre-inverted diagonal blocks — no XLA TriangularSolve. f32 compute;
    callers refine (`solve_sweep_panel` / `_refine_adaptive`).
    """
    g, np_, _ = f.lug.shape
    panel = f.linv.shape[-1]  # factor-time panel width
    nb = np_ // panel
    n, m = rhs.shape[-2], rhs.shape[-1]
    mp = max(8, _round_up(m, 8))
    r32 = jnp.zeros((g, np_, mp), jnp.float32)
    r32 = r32.at[:, :n, :m].set(rhs.astype(jnp.float32))
    r32 = r32 * f.dinv[..., None]  # equilibration: solve (D⁻¹A)x = D⁻¹b
    gather_rows = jax.vmap(lambda mat, idx: jnp.take(mat, idx, axis=0))
    bp = gather_rows(r32, f.perm)

    cols = jnp.stack(
        [f.lug[:, :, k * panel : (k + 1) * panel] for k in range(nb)]
    )  # [nb, G, Np, P]
    row_f = jnp.arange(np_, dtype=jnp.float32)[None, :, None]

    def fwd(carry, inputs):
        s, y = carry
        k, colblk, li = inputs  # colblk [G, Np, P], li [G, P, P]
        rk = lax.dynamic_slice(bp - s, (0, k * panel, 0), (g, panel, mp))
        yk = matmul_f32_accurate(li, rk)  # [G, P, Mp]
        mask = (row_f >= ((k + 1) * panel).astype(jnp.float32)).astype(
            jnp.float32
        )
        s = s + matmul_f32_accurate(colblk * mask, yk)
        y = lax.dynamic_update_slice(y, yk, (0, k * panel, 0))
        return (s, y), None

    ks = jnp.arange(nb)
    zero = jnp.zeros((g, np_, mp), jnp.float32)
    (s, y), _ = lax.scan(fwd, (zero, zero), (ks, cols, jnp.swapaxes(f.linv, 0, 1)))

    def bwd(carry, inputs):
        s, x = carry
        k, colblk, ui = inputs
        rk = lax.dynamic_slice(y - s, (0, k * panel, 0), (g, panel, mp))
        xk = matmul_f32_accurate(ui, rk)
        mask = (row_f < (k * panel).astype(jnp.float32)).astype(jnp.float32)
        s = s + matmul_f32_accurate(colblk * mask, xk)
        x = lax.dynamic_update_slice(x, xk, (0, k * panel, 0))
        return (s, x), None

    (s, x), _ = lax.scan(
        bwd, (zero, zero), (ks, cols, jnp.swapaxes(f.uinv, 0, 1)),
        reverse=True,
    )
    return x[:, :n, :m]


def solve_batch_panel(
    a: jax.Array,  # [G, N, N] working dtype (real)
    b: jax.Array,  # [G, N, M] working dtype
    config: MorfemConfig = DEFAULT_CONFIG,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched direct solve via panel LU + per-batch adaptive refinement.

    Drop-in batched counterpart of `lu_solve_refined` for real systems.
    """
    from morfem_tpu.ops.precision import precise_matmul

    f = panel_lu_factor(a, interpret=interpret, panel=config.panel_width)
    work = jnp.result_type(a.dtype, b.dtype)
    x = panel_lu_apply(f, b).astype(work)
    if jnp.finfo(work).bits <= 32 or config.refine_iterations <= 0:
        return x
    a_w = a.astype(work)
    b_w = b.astype(work)
    tol = 10 * jnp.finfo(work).eps * jnp.linalg.norm(b_w)

    def cond_fn(state):
        _, _, r_norm, r_prev, it = state
        return jnp.logical_and(
            jnp.logical_and(r_norm > tol, r_norm < 0.95 * r_prev),
            it < config.refine_iterations,
        )

    def body_fn(state):
        x, r, r_norm, _, it = state
        x = x + panel_lu_apply(f, r).astype(work)
        r_new = b_w - precise_matmul(a_w, x)
        return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

    r0 = b_w - precise_matmul(a_w, x)
    r0n = jnp.linalg.norm(r0)
    # ∞ init derived from r0n, not a fresh constant: under shard_map the
    # while_loop carry may not mix unvarying inits with mesh-varying
    # outputs (see ops/solve.py::_refine_adaptive)
    inf0 = r0n * 0 + jnp.asarray(jnp.inf, r0.real.dtype)
    x, *_ = lax.while_loop(
        cond_fn, body_fn, (x, r0, r0n, inf0, jnp.asarray(0))
    )
    return x


def solve_sweep_panel(sys, config: MorfemConfig = DEFAULT_CONFIG):
    """Full-order sweep via batched panel LU + shared-operator refinement.

    The sweep-shaped redesign of `ops/solve.py::solve_sweep` (reference:
    implementation.py:189-194): per chunk of `config.solve_chunk` points,
    assemble + factor + solve batched; then refine the WHOLE chunk with
    residuals computed against the three shared operators — wide Ozaki
    matmuls instead of per-point narrow ones. The factor runs the fast
    bf16x3 trail first and escalates per chunk to the f32-true trail when
    refinement stagnates above 1e-9·‖b‖ (see `panel_lu_factor`'s `trail`).
    Real working dtypes only (the waveguide/FEM case); complex falls back
    to `solve_sweep`.

    Returns x [I, N, M].
    """
    from morfem_tpu.ops.assembly import impulse_vector
    from morfem_tpu.ops.precision import (
        OZAKI_MIN_K,
        ozaki_apply,
        ozaki_prepare,
        precise_matmul,
    )

    i_pts = sys.num_points
    n = sys.n
    m = sys.m
    chunk = max(1, min(config.solve_chunk, i_pts))
    pad = (-i_pts) % chunk
    ts_all = jnp.concatenate(
        [sys.domain, jnp.broadcast_to(sys.domain[-1:], (pad,))]
    )
    ts_chunks = ts_all.reshape((-1, chunk))
    work = sys.b.dtype
    wide = jnp.finfo(work).bits > 32

    ops = sys.operators()
    if config.symmetrize and not sys.symmetric_ops:
        ops = tuple((o + o.T) * 0.5 for o in ops)
    use_ozaki = (
        wide
        and work == jnp.dtype(jnp.float64)
        and n >= OZAKI_MIN_K
        and jax.default_backend() == "tpu"
    )
    if use_ozaki:
        # one prep over the stacked operators → one broadcast apply (an
        # ozaki_apply instance costs ~8 s of XLA compile at this N)
        prep3 = ozaki_prepare(
            jnp.stack([o.astype(jnp.float64) for o in ops])
        )

        def ops_apply(xf):  # [N, cols] f64 → [3, N, cols]
            return ozaki_apply(prep3, xf)
    else:
        def ops_apply(xf):
            return jnp.stack(
                [precise_matmul(o.astype(work), xf) for o in ops]
            )

    refine_cap = config.refine_iterations
    # The factor consumes A(t) in f32 only (refinement residuals run
    # against the EXACT f64 operators via ops_apply, so the factor is a
    # preconditioner either way). Assembling in emulated f64 and casting
    # cost ~65 ms per chunk of elementwise double-double VPU work
    # (measured round 3, ~0.3 s of a 100-pt sweep); combining pre-cast
    # f32 operators is one fused f32 pass at HBM bandwidth. The f32-
    # assembled factor differs by ~1 ulp relative — same cond·1e-7
    # refinement contraction class.
    ops32 = [o.astype(jnp.float32) for o in ops]

    def solve_chunk(ts):
        c, cb = sys.coefficients(ts)  # [G, 3], [G]
        c32 = c.astype(jnp.float32)
        a = (
            c32[:, 0, None, None] * ops32[0]
            + c32[:, 1, None, None] * ops32[1]
            + c32[:, 2, None, None] * ops32[2]
        )
        rhs = impulse_vector(sys.b, cb)
        if not wide or refine_cap <= 0:
            # no refinement available to absorb a looser factor — use the
            # f32-true trail unconditionally
            f = panel_lu_factor(a, panel=config.panel_width)
            return panel_lu_apply(f, rhs).astype(work)

        b_w = rhs.astype(work)
        b_norm = jnp.linalg.norm(b_w)
        tol = 10 * jnp.finfo(work).eps * b_norm

        def residual(x):
            # one wide 3-stacked matmul serves the whole chunk
            xf = jnp.moveaxis(x, 0, 1).reshape(n, chunk * m)
            ys = ops_apply(xf).reshape(3, n, chunk, m)
            # elementwise weighted sum (exact in emulated f64; a dot over
            # the length-3 axis would route through the matmul emulation)
            ax = sum(c[:, p][None, :, None] * ys[p] for p in range(3))
            return b_w - jnp.moveaxis(ax, 0, 1)

        def factor_refine(trail, pivot="full"):
            if pivot == "block":
                f = panel_lu_factor_block(
                    a, trail=trail, panel=config.panel_width
                )
            else:
                f = panel_lu_factor(
                    a, trail=trail, panel=config.panel_width
                )
            x = panel_lu_apply(f, rhs).astype(work)

            def cond_fn(state):
                _, _, r_norm, r_prev, it = state
                return jnp.logical_and(
                    jnp.logical_and(r_norm > tol, r_norm < 0.95 * r_prev),
                    it < refine_cap,
                )

            def body_fn(state):
                x, r, r_norm, _, it = state
                x = x + panel_lu_apply(f, r).astype(work)
                r_new = residual(x)
                return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

            r0 = residual(x)
            x, _, r_norm, _, _ = lax.while_loop(
                cond_fn, body_fn,
                (x, r0, jnp.linalg.norm(r0),
                 jnp.asarray(jnp.inf, r0.real.dtype), jnp.asarray(0)),
            )
            return x, r_norm

        sound_tol = jnp.maximum(tol, 1e-9 * b_norm)

        if config.panel_pivot == "block":
            # GEMM-only block-pivot factor first (no full-height panel
            # kernel / pivot extraction / permutation gather); escalate
            # the WHOLE chunk to the partial-pivot factor when refinement
            # stagnated short of a sound residual (block pivoting's
            # element growth is unbounded on ill-conditioned diagonal
            # blocks — the residual check is what makes it safe).
            # panel_trail="fast" here means the FIRST factor's trailing
            # updates are bf16x3: ~2.2× cheaper per factor in isolation,
            # but end-to-end on the bundled waveguide (N=3411, I=100,
            # chunk=20) it measured 3.18 s vs 1.52 s for "accurate" —
            # block-pivot + f32x3 refinement diverges on most chunks of
            # the physical system and every escalated chunk pays BOTH
            # factors. That whole-sweep A/B (round 3, v5e) is why
            # "accurate" stays the default; "fast" only wins when the
            # sweep is known well-conditioned.
            first_trail = (
                "f32x3" if config.panel_trail == "fast" else "f32x6"
            )
            x, r_norm = factor_refine(first_trail, pivot="block")
            need_escalation = r_norm > sound_tol
            x = lax.cond(
                need_escalation,
                lambda _: factor_refine("f32x6", pivot="full")[0],
                lambda _: x,
                operand=None,
            )
            return x
        if config.panel_trail == "fast":
            # fast-trail factor first (bf16x3 trailing updates, ~1.6×
            # faster; refinement contraction ~cond·1e-5, converges for
            # cond ≲ 1e4); escalate the WHOLE chunk to the f32-true trail
            # when refinement stagnated short of a sound residual.
            # Measured on the bundled waveguide: resonant chunks
            # (cond ≳ 1e5) DIVERGE under the fast trail and pay both
            # factors — that sweep is ~13% slower overall, which is why
            # "accurate" is the default; "fast" wins ~15% on
            # well-conditioned sweeps (BENCH extras / ROUND_NOTES r3).
            x, r_norm = factor_refine("f32x3")
            need_escalation = r_norm > sound_tol
            x = lax.cond(
                need_escalation,
                lambda _: factor_refine("f32x6")[0],
                lambda _: x,
                operand=None,
            )
            return x
        x, _ = factor_refine("f32x6")
        return x

    xs = lax.map(solve_chunk, ts_chunks)
    xs = xs.reshape((-1,) + xs.shape[2:])
    return xs[:i_pts]
