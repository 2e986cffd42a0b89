"""Pallas panel factorization — the sequential core of the blocked LU.

Why this kernel exists. The full-order sweep factors one N×N system per
frequency point (the role of `splu` / `lu_factor` in the reference,
implementation.py:468-480). XLA's `LuDecomposition` runs the O(N³) work at
~0.6 TFLOP/s effective on this chip (~1% of the MXU) because its pivoting
lowers to long scalar-ish dynamic-update-slice chains. A blocked
right-looking LU fixes that: all O(N³) FLOPs become rank-`P` GEMM trailing
updates (`ops/panel_lu.py`), and the only part that is genuinely
sequential — factoring one [N, P] panel with partial pivoting — is this
kernel, whose per-column work is O(N·SUB) VPU operations entirely in VMEM.

Design (pivoting without row swaps):

  * The panel lives TRANSPOSED in VMEM: `pt` is [P, Npl] — panel columns
    in sublanes, the N matrix rows in lanes. A column step's pivot search
    is then a masked max over the LANE axis (one VPU reduction), and the
    pivot row is extracted with a one-hot lane contraction — no
    data-dependent slicing anywhere.
  * Rows are never exchanged. An availability mask (`avail`, 1.0 = row
    not yet chosen as a pivot) restricts the argmax; used rows keep their
    U-row entries and are excluded from elimination (their multiplier is
    forced to zero). The pivot order is recorded and the compact,
    textbook-ordered LU is recovered afterwards with ONE row gather
    (`ops/panel_lu.py::_compact`).
  * Two-level blocking inside the panel: columns are processed in
    SUB-wide groups; a column step touches only its [SUB, Npl] group
    (O(N·SUB) work), and each finished group is applied to the rest of
    the panel as a rank-SUB MXU update. The composed elimination
    coefficients C̃ (such that applying the whole panel's elimination to
    any trailing column block is `block += C̃ᵀ @ block[pivots]`) are
    accumulated the same way — this is the algebra of
    `ops/blocked_inverse.py` restricted to the LU (right-looking) case.

In-kernel dots use `preferred_element_type=f32` + HIGHEST precision: the
operands are [P, SUB]-shaped — small enough that the multi-pass penalty
is irrelevant, and a bf16 1-pass product here would poison the factor.

Reference role: `/root/reference/implementation.py:474-476` (splu) /
`:477-478` (lu_factor) — the factorization this kernel replaces at MXU
rates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # inner blocking width: one sublane tile of column steps


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _panel_kernel(
    pt_ref,  # [P, Npl] f32 — transposed panel (in)
    avail_ref,  # [8, Npl] f32 — row-availability mask, row 0 used (in)
    fac_ref,  # [P, Npl] f32 — factored panel out (U rows + multipliers)
    c_ref,  # [P, Npl] f32 — composed elimination coefficients C̃ out
    piv_ref,  # [8, P] f32 — pivot row indices out (row 0)
    avail_out_ref,  # [8, Npl] f32 — updated availability out
    pt_s,  # scratch [P, Npl]
    ct_s,  # scratch [P, Npl]
    blk_s,  # scratch [SUB, Npl]
    cs_s,  # scratch [SUB, Npl]
    oh_s,  # scratch [SUB, Npl] — the sub-block's one-hot pivot rows
    av_s,  # scratch [8, Npl]
    pv_s,  # scratch [8, P]
    *,
    p_cols: int,
    npl: int,
):
    f32 = jnp.float32
    nsub = p_cols // SUB

    pt_s[:] = pt_ref[:]
    ct_s[:] = jnp.zeros((p_cols, npl), f32)
    av_s[:] = avail_ref[:]
    pv_s[:] = jnp.zeros((8, p_cols), f32)

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, npl), 1).astype(f32)
    prow_f = jax.lax.broadcasted_iota(jnp.int32, (p_cols, 1), 0).astype(f32)
    pcol_f = jax.lax.broadcasted_iota(jnp.int32, (8, p_cols), 1).astype(f32)

    def sub_step(s, _):
        s0f = jax.lax.convert_element_type(s, f32) * float(SUB)
        blk_s[:] = pt_s[pl.ds(s * SUB, SUB), :]
        cs_s[:] = jnp.zeros((SUB, npl), f32)
        oh_s[:] = jnp.zeros((SUB, npl), f32)

        for i in range(SUB):  # static unroll: O(N·SUB) VPU work per step
            col = blk_s[i : i + 1, :]  # [1, Npl]
            av = av_s[0:1, :]
            score = jnp.abs(col) * av - (1.0 - av)
            mx = jnp.max(score, axis=1, keepdims=True)
            hit = (score >= mx).astype(f32)
            cand = jnp.where(hit > 0.0, lane_f, jnp.float32(npl))
            pmin = jnp.min(cand, axis=1, keepdims=True)  # [1, 1]
            oh = (lane_f == pmin).astype(f32)  # [1, Npl]
            piv = jnp.sum(oh * col, axis=1, keepdims=True)  # [1, 1]
            inv = 1.0 / piv
            # multipliers for still-unused, non-pivot rows; used rows keep
            # their U entries and must not be eliminated again
            l_row = col * inv * av * (1.0 - oh)  # [1, Npl]
            c = -l_row
            # eliminate in the not-yet-processed block columns (rows > i)
            bcol = jnp.sum(blk_s[:] * oh, axis=1, keepdims=True)  # [SUB, 1]
            rmask = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0) > i
            ).astype(f32)
            blk_s[:] = blk_s[:] + (rmask * bcol) * c
            # compose into the already-produced coefficient rows (< i)
            ccol = jnp.sum(cs_s[:] * oh, axis=1, keepdims=True)
            lmask = (
                jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0) < i
            ).astype(f32)
            cs_s[:] = cs_s[:] + (lmask * ccol) * c
            cs_s[i : i + 1, :] = c
            oh_s[i : i + 1, :] = oh
            # in-place LU storage: used rows keep U entries, the pivot
            # keeps its value, unused rows store the multiplier l
            blk_s[i : i + 1, :] = col * (1.0 - av) + col * oh + l_row
            av_s[0:1, :] = av * (1.0 - oh)
            # record pivot index at panel column s·SUB + i
            step_oh = (pcol_f == (s0f + float(i))).astype(f32)  # [8, P]
            pv_s[:] = pv_s[:] + step_oh * pmin[0, 0]

        pt_s[pl.ds(s * SUB, SUB), :] = blk_s[:]

        # rank-SUB MXU update of the rest of the panel (rows beyond the
        # sub-block) and composition into earlier coefficient rows
        oh_t = oh_s[:]  # [SUB, Npl]
        b8 = jax.lax.dot_general(
            pt_s[:], oh_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, SUB] — pivot-row entries of every panel column
        gt = (prow_f >= (s0f + float(SUB))).astype(f32)  # [P, 1]
        upd = jax.lax.dot_general(
            b8, cs_s[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, Npl]
        pt_s[:] = pt_s[:] + gt * upd

        c8 = jax.lax.dot_general(
            ct_s[:], oh_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [P, SUB]
        lt = (prow_f < s0f).astype(f32)
        cupd = jax.lax.dot_general(
            c8, cs_s[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
        ct_s[:] = ct_s[:] + lt * cupd
        ct_s[pl.ds(s * SUB, SUB), :] = cs_s[:]
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nsub), sub_step, jnp.int32(0))

    fac_ref[:] = pt_s[:]
    c_ref[:] = ct_s[:]
    piv_ref[:] = pv_s[:]
    avail_out_ref[:] = av_s[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def panel_factor(
    panel_t: jax.Array,  # [G, P, Npl] f32 — transposed panels (batched)
    avail: jax.Array,  # [G, Npl] f32 — 1.0 where the row is unused
    interpret: bool = False,
):
    """Factor a batch of [N, P] panels with masked partial pivoting.

    Args:
      panel_t: [G, P, Npl] transposed panels (P = panel width, a multiple
        of 8; Npl = padded row count, a multiple of 128).
      avail: [G, Npl] row-availability mask.

    Returns:
      (fac_t [G, P, Npl], c_t [G, P, Npl], piv [G, P] int32,
       avail_new [G, Npl]):
      `fac_t` holds U entries in pivot rows and multipliers elsewhere;
      `c_t` the composed elimination coefficients (apply the panel to a
      trailing column block as `block += c_tᵀ-weighted pivot rows`, see
      ops/panel_lu.py); `piv` the pivot row index per panel column.
    """
    g, p_cols, npl = panel_t.shape
    f32 = jnp.float32
    panel2d = panel_t.astype(f32).reshape(g * p_cols, npl)
    av2d = jnp.broadcast_to(avail.astype(f32)[:, None, :], (g, 8, npl))
    av2d = av2d.reshape(g * 8, npl)

    kernel = functools.partial(_panel_kernel, p_cols=p_cols, npl=npl)
    grid = (g,)
    # all refs 2D (G folded into rows): 3D tiled BlockSpecs are fragile on
    # this Mosaic version; 2D blocks with g-indexed maps are not
    out_shape = (
        jax.ShapeDtypeStruct((g * p_cols, npl), f32),
        jax.ShapeDtypeStruct((g * p_cols, npl), f32),
        jax.ShapeDtypeStruct((g * 8, p_cols), f32),
        jax.ShapeDtypeStruct((g * 8, npl), f32),
    )
    with jax.enable_x64(False):  # x64 tracing emits i64 Mosaic can't lower
        fac2d, c2d, piv2d, av_out2d = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((p_cols, npl), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, npl), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((p_cols, npl), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p_cols, npl), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, p_cols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, npl), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((p_cols, npl), f32),
                pltpu.VMEM((p_cols, npl), f32),
                pltpu.VMEM((SUB, npl), f32),
                pltpu.VMEM((SUB, npl), f32),
                pltpu.VMEM((SUB, npl), f32),
                pltpu.VMEM((8, npl), f32),
                pltpu.VMEM((8, p_cols), f32),
            ],
            interpret=interpret,
        )(panel2d, av2d)
    fac_t = fac2d.reshape(g, p_cols, npl)
    c_t = c2d.reshape(g, p_cols, npl)
    piv = piv2d.reshape(g, 8, p_cols)[:, 0, :].astype(jnp.int32)
    avail_new = av_out2d.reshape(g, 8, npl)[:, 0, :]
    return fac_t, c_t, piv, avail_new
