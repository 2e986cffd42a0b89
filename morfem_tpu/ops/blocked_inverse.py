"""Blocked Gauss-Jordan inverse on the MXU — TPU-native direct factorization.

The reference factorizes every full-order system with SciPy's LU
(implementation.py:468-480). On this TPU, XLA's `LuDecomposition` runs at
~0.3-0.5 TFLOP/s at N≈3.4k (measured — it doesn't tile onto the MXU) and
`TriangularSolve` is slower still; both sit two orders of magnitude below
the chip's GEMM rate. This module instead computes an explicit approximate
inverse by blocked Gauss-Jordan elimination with partial pivoting,
organized so the O(N³) work is rank-`panel` GEMM updates on the MXU (run
f32-true via bf16 multi-word splits,
`ops/precision.py::matmul_f32_accurate`). Downstream, every solve — and
every f64 iterative-refinement step (ops/solve.py) — becomes a single
matmul, which also removes XLA's slow triangular solves from the hot path.

Design: pivoting WITHOUT row swaps. Rows are never physically exchanged
during elimination (dynamic row swaps are scatter-heavy and hostile to
static-shape compilation). Instead:

  * a pivot-availability mask drives the per-column argmax;
  * the composed elimination transform of a block of columns is
    accumulated as coefficients C with G = I + C·E (E selects the pivot
    rows), exactly like a product of elementary GJ transforms;
  * C is applied to everything wider as ONE rank-w GEMM (two-level
    blocking: width-`sub` inner blocks propagate into the `panel`, panels
    propagate into the full matrix);
  * the final row/column permutation is undone with two gathers.

Every shape is static, every hot op is a GEMM, and the whole factorization
jits as one program — the design the MXU wants; the reference has no
analogue (SURVEY.md §7 "hard parts": sparse direct solve on TPU).

Accuracy: with partial pivoting the computed inverse has relative error
~cond(A)·ε_f32, the same class as an f32 LU solve; the adaptive f64
refinement in `ops/solve.py` then contracts to working precision exactly
as for the LU backend. Verified against numpy.linalg.inv in
tests/test_blocked_inverse.py, and against the LU path at N=3411 in bench.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from morfem_tpu.ops.precision import matmul_f32_accurate


def gj_panel_factor(
    pb: jax.Array, avail: jax.Array, sub: int
) -> tuple:
    """Factor ONE [n, panel] column panel of the Gauss-Jordan elimination.

    Returns (cp, pivpanel, avail): the composed elimination coefficients
    of the panel's columns (G_panel = I + cp·E), the pivot row chosen per
    column, and the updated availability mask. Shared by the single-chip
    inverse below and the tensor-parallel one
    (parallel/tp_dense.py) — the distributed version runs this on the
    panel owner and broadcasts (cp, pivpanel).
    """
    n, panel = pb.shape
    nsub = panel // sub
    sub_iota = lax.iota(jnp.int32, sub)
    panel_iota = lax.iota(jnp.int32, panel)

    def column_step(i, carry):
        blk, cs, avail, pivlocal = carry
        col = lax.dynamic_slice(blk, (0, i), (n, 1))[:, 0]
        cand = jnp.where(avail, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(cand).astype(jnp.int32)
        piv = col[p]
        c = -col / piv
        c = c.at[p].set(1.0 / piv - 1.0)
        zero = jnp.zeros((), p.dtype)
        rowb = lax.dynamic_slice(blk, (p, zero), (1, sub))[0]
        rowc = lax.dynamic_slice(cs, (p, zero), (1, sub))[0]
        # eliminate in the still-unprocessed block columns…
        blk = blk + c[:, None] * jnp.where(sub_iota > i, rowb, 0.0)[None, :]
        # …compose into the already-produced C columns, and record c
        cs = cs + c[:, None] * jnp.where(sub_iota < i, rowc, 0.0)[None, :]
        cs = lax.dynamic_update_slice(cs, c[:, None], (0, i))
        avail = avail.at[p].set(False)
        pivlocal = pivlocal.at[i].set(p)
        return blk, cs, avail, pivlocal

    def sub_step(s, carry):
        pb, cp, avail, pivpanel = carry
        blk = lax.dynamic_slice(pb, (0, s * sub), (n, sub))
        # inits DERIVED from blk (not fresh zeros): under shard_map the
        # loop outputs are varying over the mesh axis, and a fori_loop
        # carry may not mix unvarying inits with varying outputs
        cs0 = blk * 0.0
        piv0 = (blk[0] * 0.0).astype(jnp.int32)
        _, cs, avail, pivlocal = lax.fori_loop(
            0, sub, column_step, (blk, cs0, avail, piv0)
        )
        rows_pb = jnp.take(pb, pivlocal, axis=0)  # [sub, panel]
        rows_cp = jnp.take(cp, pivlocal, axis=0)
        right = (panel_iota >= (s + 1) * sub)[None, :]
        left = (panel_iota < s * sub)[None, :]
        pb = pb + matmul_f32_accurate(cs, jnp.where(right, rows_pb, 0.0))
        cp = cp + matmul_f32_accurate(cs, jnp.where(left, rows_cp, 0.0))
        cp = lax.dynamic_update_slice(cp, cs, (0, s * sub))
        pivpanel = lax.dynamic_update_slice(pivpanel, pivlocal, (s * sub,))
        return pb, cp, avail, pivpanel

    cp0 = pb * 0.0  # derived init — see sub_step
    pivpanel0 = (pb[0] * 0.0).astype(jnp.int32)
    _, cp_out, avail_out, pivpanel_out = lax.fori_loop(
        0, nsub, sub_step, (pb, cp0, avail, pivpanel0)
    )
    return cp_out, pivpanel_out, avail_out


def _gj_inverse_single(a32: jax.Array, panel: int, sub: int) -> jax.Array:
    """Inverse of one padded f32 matrix ([n, n], n a multiple of `panel`)."""
    n = a32.shape[-1]
    npanels = n // panel
    row_iota = lax.iota(jnp.int32, n)

    def panel_step(k, carry):
        m, avail, pivrows = carry
        j0 = k * panel
        pb = lax.dynamic_slice(m, (0, j0), (n, panel))
        cp, pivpanel, avail = gj_panel_factor(pb, avail, sub)
        rows_m = jnp.take(m, pivpanel, axis=0)  # [panel, n]
        m = m + matmul_f32_accurate(cp, rows_m)
        m = lax.dynamic_update_slice(m, cp, (0, j0))
        pivrows = lax.dynamic_update_slice(pivrows, pivpanel, (j0,))
        return m, avail, pivrows

    avail0 = jnp.ones((n,), bool)
    piv0 = jnp.zeros((n,), jnp.int32)
    m, _, pivrows = lax.fori_loop(0, npanels, panel_step, (a32, avail0, piv0))

    # Unscramble: G = I + C_all·E with E[j,:] = e_{p_j}ᵀ, and G·A = P
    # (P[p_j, j] = 1), so A⁻¹ = Pᵀ·G. Column c of G is e_c + C[:, step(c)]
    # with step(c) the elimination step that pivoted row c.
    inv_perm = jnp.zeros((n,), jnp.int32).at[pivrows].set(
        row_iota, mode="drop"
    )
    g = jnp.take(m, inv_perm, axis=1)
    g = g + jnp.eye(n, dtype=jnp.float32)
    return jnp.take(g, pivrows, axis=0)


@partial(jax.jit, static_argnames=("panel", "sub"))
def gj_inverse_f32(a: jax.Array, panel: int = 256, sub: int = 8) -> jax.Array:
    """Approximate f32 inverse via blocked pivot-masked Gauss-Jordan.

    Args:
      a: [..., N, N] real matrices (any float dtype; computed in f32).
      panel: outer block width — the rank of the full-width MXU updates.
      sub: inner block width — the working set of the sequential
        per-column elimination loop (keeps its traffic at O(N·sub) per
        column instead of O(N·panel)).

    Returns:
      [..., N, N] f32 approximate inverses (relative error ~cond·ε_f32;
      wrap with refinement for working-precision solves, ops/solve.py).
    """
    n0 = a.shape[-1]
    if a.shape[-2] != n0:
        raise ValueError(f"square matrices required, got {a.shape}")
    panel = max(sub, min(panel, ((n0 + sub - 1) // sub) * sub))
    # nsub = panel // sub truncates — a panel that is not a multiple of
    # `sub` would silently skip its last panel % sub columns (garbage
    # inverse, no error); round up instead
    panel = ((panel + sub - 1) // sub) * sub
    n = ((n0 + panel - 1) // panel) * panel
    a32 = a.astype(jnp.float32)
    # Row equilibration: the composed coefficients store G−I, whose pivot
    # entries are 1/piv − 1 — for |piv| ≫ 1 the 1/piv term is absorbed
    # into the −1 in f32 (catastrophically: the inverse's diagonal becomes
    # exactly 0 for matrix scales ≳1e8). Scaling every row to unit max
    # keeps pivots O(1); A = D·B ⇒ A⁻¹ = B⁻¹·D⁻¹ is undone on the columns.
    d = jnp.max(jnp.abs(a32), axis=-1)
    d = jnp.where(d == 0, 1.0, d)
    a32 = a32 / d[..., :, None]
    if n != n0:
        pad = n - n0
        eye_pad = jnp.eye(pad, dtype=jnp.float32)
        a32 = jnp.concatenate(
            [
                jnp.concatenate(
                    [a32, jnp.zeros(a.shape[:-2] + (n0, pad), jnp.float32)],
                    axis=-1,
                ),
                jnp.concatenate(
                    [
                        jnp.zeros(a.shape[:-2] + (pad, n0), jnp.float32),
                        jnp.broadcast_to(eye_pad, a.shape[:-2] + (pad, pad)),
                    ],
                    axis=-1,
                ),
            ],
            axis=-2,
        )
    fn = lambda x: _gj_inverse_single(x, panel, sub)  # noqa: E731
    for _ in range(a32.ndim - 2):
        fn = jax.vmap(fn)
    out = fn(a32)[..., :n0, :n0]
    return out / d[..., None, :]
