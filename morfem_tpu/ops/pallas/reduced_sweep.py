"""Fused Pallas kernel for the reduced-model frequency sweep.

The XLA path materializes the [I, K, K] batch of reduced systems in HBM,
then calls the batched LU (whose pivoting lowers to long sequences of
dynamic-update-slices on TPU). This kernel fuses, per grid tile of TI
frequency points, entirely in VMEM:

    assemble  A_i = Σ_p c_p(t_i)·R_p   (+ symmetrization + padding diag)
    solve     A_i · x_i = rhs_i

The solver is Gauss–Jordan elimination with *implicit* partial pivoting:
at step j the pivot row is selected by a masked argmax over column j and
extracted with a one-hot contraction — no data-dependent row swaps, every
operation is a dense [TI, K]- or [TI, K, K]-shaped VPU op, vectorized
across the TI frequency points in the tile. After K steps A has become a
permutation matrix and the solution is recovered with one batched MXU
matmul  x = Aᵀ·B.

Numerical notes: the elimination runs in float32 (like the XLA path's
factorization); callers wanting f64 accuracy run iterative refinement
around it (`pallas_reduced_sweep` does, matching `solve_reduced_batch`
semantics). Gauss–Jordan with column pivoting has the same practical
stability as partial-pivoted LU for these well-scaled reduced systems.

The right-hand sides and solutions are carried TRANSPOSED ([TI, M, K]) so
their last (lane) dimension is the 128-aligned K axis, not the tiny port
count M.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tracing the elimination loop inside pallas_call under x64 builds deep
# convert-element-type bind chains that overflow CPython's default 1000
# recursion frames. 10k is comfortably above what the kernel needs.
if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gj_solve_kernel(
    c_ref,  # [TI, 128] f32 coefficients per point (first 3 lanes used)
    r0_ref,  # [Ks, Kl] f32 (rows sublane-tight, columns lane-padded)
    r1_ref,
    r2_ref,
    rhs_ref,  # [TI, Mp, Kl] f32 (transposed RHS; row index in lanes)
    diag_ref,  # [8, Kl] f32 (row 0 used): 1.0 on padding/inactive diag
    out_ref,  # [TI, Mp, Kl] f32 (transposed solutions)
    a_scratch,  # [TI, Ks, Kl] f32
    b_scratch,  # [TI, Mp, Kl] f32
    p_scratch,  # [TI, Ks, Kl] f32 — permutation rows, one per column step
    used_scratch,  # [TI, Kl] f32
    *,
    k_active: int,
    symmetrize: bool,
):
    ti = c_ref.shape[0]
    ks = r0_ref.shape[0]
    kl = r0_ref.shape[1]

    c = c_ref[:]  # [TI, 128]; only lanes 0..2 carry coefficients
    a = (
        c[:, 0][:, None, None] * r0_ref[:][None]
        + c[:, 1][:, None, None] * r1_ref[:][None]
        + c[:, 2][:, None, None] * r2_ref[:][None]
    )
    if symmetrize:
        # R blocks are stored with their (A+Aᵀ)/2 already applied by the
        # wrapper when rows≠cols paddings differ; the per-point combination
        # of symmetric blocks stays symmetric, so nothing to do here.
        pass
    # rectangular identity on the [0, k) diagonal carries the inactive-
    # column padding (rows beyond k are zero and never pivoted)
    eye = jax.lax.broadcasted_iota(jnp.int32, (ks, kl), 0) == (
        jax.lax.broadcasted_iota(jnp.int32, (ks, kl), 1)
    )
    a = a + (eye.astype(a.dtype) * diag_ref[0][None, :])[None]
    a_scratch[:] = a
    b_scratch[:] = rhs_ref[:]
    p_scratch[:] = jnp.zeros((ti, ks, kl), jnp.float32)
    used_scratch[:] = jnp.zeros((ti, kl), jnp.float32)

    # Float iota for all index math (i64 anywhere recurses in Mosaic's
    # convert lowering; tpu.iota is integer-only, so build i32 → f32).
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (ti, kl), 1).astype(
        jnp.float32
    )

    def step(j, _):
        a = a_scratch[:]
        bt = b_scratch[:]
        used = used_scratch[:]
        jf = jax.lax.convert_element_type(j, jnp.float32)
        colmask = (lane_f[:1] == jf).astype(jnp.float32)  # [1, Kl]
        col_s = jnp.sum(a * colmask[:, None, :], axis=2)  # [TI, Ks]
        if kl > ks:  # zero-extend row values to lane width
            col = jnp.concatenate(
                [col_s, jnp.zeros((ti, kl - ks), jnp.float32)], axis=1
            )
        else:
            col = col_s
        # pivot: largest unused |entry|; first-max via float comparisons
        score = jnp.abs(col) * (1.0 - used) - used
        mx = jnp.max(score, axis=1, keepdims=True)
        hit = (score >= mx).astype(jnp.float32)
        cand = jnp.where(hit > 0.0, lane_f, jnp.float32(kl))
        first = jnp.min(cand, axis=1, keepdims=True)
        onehot = (lane_f == first).astype(jnp.float32)  # [TI, Kl]
        pivot_val = jnp.sum(onehot * col, axis=1)  # [TI]
        inv = 1.0 / pivot_val
        oh_rows = onehot[:, :ks]  # [TI, Ks]
        row_a = jnp.sum(a * oh_rows[:, :, None], axis=1) * inv[:, None]
        row_b = jnp.sum(bt * onehot[:, None, :], axis=2) * inv[:, None]
        factor = col * (1.0 - onehot)
        f_rows = factor[:, :ks]
        a_scratch[:] = (
            (a - f_rows[:, :, None] * row_a[:, None, :])
            * (1.0 - oh_rows)[:, :, None]
            + oh_rows[:, :, None] * row_a[:, None, :]
        )
        keep = 1.0 - onehot[:, None, :]
        b_scratch[:] = (
            (bt - row_b[:, :, None] * factor[:, None, :]) * keep
            + row_b[:, :, None] * onehot[:, None, :]
        )
        used_scratch[:] = used + onehot
        # record the permutation row for column j (x[j] = B_final[pivot])
        p_scratch[:, pl.ds(j, 1), :] = onehot[:, None, :]
        return jnp.int32(0)

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(k_active), step, jnp.int32(0)
    )
    # x[j] = Σ_r P[j, r]·B_final[r]  → xt[i] = Bt[i] @ P[i]ᵀ, i.e. one
    # batched MXU matmul contracting the lane (row) axis.
    # precision=HIGHEST: the default f32 MXU path rounds through bf16.
    xt = jax.lax.dot_general(
        b_scratch[:],
        p_scratch[:],
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TI, Mp, Ks]
    if kl > ks:
        xt = jnp.concatenate(
            [xt, jnp.zeros((ti, xt.shape[1], kl - ks), jnp.float32)], axis=2
        )
    out_ref[:] = xt


def gauss_jordan_sweep_solve(
    r0: jax.Array,  # [K, K]
    r1: jax.Array,
    r2: jax.Array,
    c: jax.Array,  # [I, 3]
    rhs: jax.Array,  # [I, K, M]
    inactive_diag: jax.Array,  # [K] 1.0 where identity padding needed
    symmetrize: bool = True,
    tile: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Solve A(t_i)·x_i = rhs_i for all points with the fused GJ kernel.

    All inputs any float dtype; computation in f32; returns f32 [I, K, M].
    Layout note: the R blocks keep a sublane-tight row dimension
    (Ks = ⌈K/8⌉·8) while lanes pad to 128 (Kl) — at K≈36 this makes the
    elimination's per-step work ~3× smaller than a square 128-padded
    buffer would.
    """
    # Mosaic only compiles for TPU; on the CPU backend (unit tests,
    # virtual meshes) fall back to interpret mode automatically — same
    # convention as the banded and block-sparse kernels.
    interpret = interpret or jax.default_backend() == "cpu"
    i_pts, k, m = rhs.shape
    ks = _round_up(max(k, 8), 8)
    kl = _round_up(max(k, 8), 128)
    mp = _round_up(max(m, 8), 8)
    grid = (pl.cdiv(i_pts, tile),)
    i_pad = grid[0] * tile - i_pts

    f32 = jnp.float32

    def pad_op(r):
        r = r.astype(f32)
        if symmetrize:
            r = (r + r.T) * 0.5  # pre-symmetrize (padding breaks it later)
        return jnp.zeros((ks, kl), f32).at[:k, :k].set(r)

    r0p, r1p, r2p = pad_op(r0), pad_op(r1), pad_op(r2)
    diag = jnp.ones((1, kl), f32).at[0, :k].set(inactive_diag.astype(f32))
    c_p = jnp.zeros((i_pts + i_pad, 128), f32).at[:i_pts, :3].set(
        c.astype(f32)
    )
    rhs_t = jnp.swapaxes(rhs.astype(f32), 1, 2)  # [I, M, K]
    rhs_p = jnp.pad(rhs_t, ((0, i_pad), (0, mp - m), (0, kl - k)))

    kernel = functools.partial(
        _gj_solve_kernel, k_active=k, symmetrize=symmetrize
    )
    # The kernel is pure f32, but tracing a GRIDDED pallas_call under x64
    # mode emits i64 grid/index arithmetic that Mosaic cannot legalize
    # ("failed to legalize operation 'func.return'"); trace it in x32.
    with jax.enable_x64(False):
        out = _pallas_gj_call(kernel, grid, tile, ks, kl, mp,
                              interpret, c_p, r0p, r1p, r2p, rhs_p, diag)
    x = jnp.swapaxes(out[:i_pts, :m, :k], 1, 2)  # [I, K, M]
    return x


def _pallas_gj_call(
    kernel, grid, tile, ks, kl, mp, interpret,
    c_p, r0p, r1p, r2p, rhs_p, diag,
):
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, kl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, kl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ks, kl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, mp, kl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, kl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, mp, kl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * tile, mp, kl), f32),
        scratch_shapes=[
            pltpu.VMEM((tile, ks, kl), f32),
            pltpu.VMEM((tile, mp, kl), f32),
            pltpu.VMEM((tile, ks, kl), f32),
            pltpu.VMEM((tile, kl), f32),
        ],
        interpret=interpret,
    )(c_p, r0p, r1p, r2p, rhs_p, jnp.broadcast_to(diag, (8, kl)))


def pallas_reduced_sweep(rm, ts: jax.Array, config) -> jax.Array:
    """Drop-in reduced sweep via the fused kernel + f64 refinement.

    Matches `morfem_tpu.mor.reduced.sweep` semantics: f32 elimination (the
    kernel) plus `config.refine_iterations` steps of iterative refinement
    with residuals computed as three [K,K]×[I,K,M] matmuls — the [I, K, K]
    system batch is never materialized in HBM.
    """
    from morfem_tpu.ops.orthonormalize import column_mask

    if rm.r_extra:
        # the fused kernel assembles exactly the classic 3-term pencil;
        # P>3 models (complex-coefficient embeddings) take the XLA path
        from morfem_tpu.mor.reduced import assemble_reduced, solve_reduced_batch

        a, rhs = assemble_reduced(rm, ts, config)
        return solve_reduced_batch(a, rhs, config)
    c, cb = rm.coefficients(ts)
    k = rm.k
    mask = column_mask(k, rm.ncols, rm.b_r.dtype)
    b_masked = rm.b_r * mask[:, None]
    rhs = cb[:, None, None] * b_masked
    inactive = 1.0 - mask

    x = gauss_jordan_sweep_solve(
        rm.r0, rm.r1, rm.r2, c, rhs, inactive,
        symmetrize=config.symmetrize,
    ).astype(rhs.dtype)

    # reduced systems are benign (cond ≲ 1e6): 3 refinement passes reach
    # working precision; the config cap exists for full-order resonances
    refine = min(config.refine_iterations, 3)
    if refine > 0:
        ops = (rm.r0, rm.r1, rm.r2)

        def residual(x):
            ax = jnp.zeros_like(x)
            for p, r in enumerate(ops):
                rx = jnp.einsum("kl,ilm->ikm", r, x)
                if config.symmetrize:
                    rtx = jnp.einsum("lk,ilm->ikm", r, x)
                    rx = (rx + rtx) * 0.5
                ax = ax + c[:, p, None, None] * rx
            ax = ax + inactive[None, :, None] * x
            return rhs - ax

        def body(_, x):
            r = residual(x)
            d = gauss_jordan_sweep_solve(
                rm.r0, rm.r1, rm.r2, c, r, inactive,
                symmetrize=config.symmetrize,
            ).astype(x.dtype)
            return x + d

        x = jax.lax.fori_loop(0, refine, body, x)
    return x
