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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gj_solve_kernel(
    c_ref,  # [TI, 3] f32 coefficients per point
    r0_ref,  # [Kp, Kp] f32
    r1_ref,
    r2_ref,
    rhs_ref,  # [TI, M, Kp] f32 (transposed RHS)
    diag_ref,  # [1, Kp] f32: 1.0 on padding/inactive diagonal, else 0
    out_ref,  # [TI, M, Kp] f32 (transposed solutions)
    a_scratch,  # [TI, Kp, Kp] f32
    b_scratch,  # [TI, M, Kp] f32
    used_scratch,  # [TI, Kp] f32
    *,
    k_active: int,
    symmetrize: bool,
):
    ti = c_ref.shape[0]
    kp = r0_ref.shape[0]

    c = c_ref[:]  # [TI, 3]
    r0 = r0_ref[:]
    r1 = r1_ref[:]
    r2 = r2_ref[:]
    a = (
        c[:, 0][:, None, None] * r0[None]
        + c[:, 1][:, None, None] * r1[None]
        + c[:, 2][:, None, None] * r2[None]
    )
    if symmetrize:
        a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    # identity on inactive/padding diagonal keeps the elimination regular
    eye = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0) == (
        jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    )
    a = a + (eye.astype(a.dtype) * diag_ref[0][None, :])[None]
    a_scratch[:] = a
    b_scratch[:] = rhs_ref[:]
    used_scratch[:] = jnp.zeros((ti, kp), jnp.float32)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ti, kp), 1)

    def step(j, _):
        a = a_scratch[:]
        bt = b_scratch[:]
        used = used_scratch[:]
        # column j extracted with a one-hot contraction (runtime lane
        # slicing is not TPU-friendly)
        colmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1) == j
        ).astype(jnp.float32)  # [1, Kp]
        col = jnp.einsum(
            "ikl,zl->ik", a, colmask, preferred_element_type=jnp.float32
        )  # [TI, Kp]
        # pivot: largest unused |entry| of column j
        score = jnp.abs(col) * (1.0 - used) - used
        p = jnp.argmax(score, axis=1)  # [TI]
        onehot = (col_ids == p[:, None]).astype(jnp.float32)  # [TI, Kp]
        pivot_val = jnp.sum(onehot * col, axis=1)  # [TI]
        inv = 1.0 / pivot_val
        row_a = jnp.einsum(
            "ik,ikl->il", onehot, a, preferred_element_type=jnp.float32
        ) * inv[:, None]  # normalized pivot row [TI, Kp]
        row_b = jnp.einsum(
            "ik,imk->im", onehot, bt, preferred_element_type=jnp.float32
        ) * inv[:, None]  # [TI, M]
        factor = col * (1.0 - onehot)  # eliminate from all other rows
        a_new = a - factor[:, :, None] * row_a[:, None, :]
        bt_new = bt - row_b[:, :, None] * factor[:, None, :]
        # write the normalized pivot row back in place
        a_scratch[:] = (
            a_new * (1.0 - onehot)[:, :, None]
            + onehot[:, :, None] * row_a[:, None, :]
        )
        keep = 1.0 - onehot[:, None, :]  # [TI, 1, Kp] broadcast over M
        b_scratch[:] = bt_new * keep + row_b[:, :, None] * onehot[:, None, :]
        used_scratch[:] = used + onehot
        return 0

    jax.lax.fori_loop(0, k_active, step, 0)
    # A is now a (batched) permutation matrix; x = Aᵀ·B, transposed form:
    # xt[i] = Bt[i] @ A[i]  → [TI, M, Kp]
    out_ref[:] = jax.lax.dot_general(
        b_scratch[:],
        a_scratch[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def gauss_jordan_sweep_solve(
    r0: jax.Array,  # [K, K]
    r1: jax.Array,
    r2: jax.Array,
    c: jax.Array,  # [I, 3]
    rhs: jax.Array,  # [I, K, M]
    inactive_diag: jax.Array,  # [K] 1.0 where identity padding needed
    symmetrize: bool = True,
    tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Solve A(t_i)·x_i = rhs_i for all points with the fused GJ kernel.

    All inputs any float dtype; computation in f32; returns f32 [I, K, M].
    """
    i_pts, k, m = rhs.shape
    kp = _round_up(max(k, 8), 128)
    grid = (pl.cdiv(i_pts, tile),)
    i_pad = grid[0] * tile - i_pts

    f32 = jnp.float32
    r0p = jnp.zeros((kp, kp), f32).at[:k, :k].set(r0.astype(f32))
    r1p = jnp.zeros((kp, kp), f32).at[:k, :k].set(r1.astype(f32))
    r2p = jnp.zeros((kp, kp), f32).at[:k, :k].set(r2.astype(f32))
    diag = jnp.ones((1, kp), f32).at[0, :k].set(inactive_diag.astype(f32))
    c_p = jnp.pad(c.astype(f32), ((0, i_pad), (0, 0)))
    rhs_t = jnp.swapaxes(rhs.astype(f32), 1, 2)  # [I, M, K]
    rhs_p = jnp.pad(rhs_t, ((0, i_pad), (0, 0), (0, kp - k)))

    # only the first k columns need elimination: padding rows/columns are
    # exact identity and never win the pivot argmax for a regular system
    kernel = functools.partial(
        _gj_solve_kernel, k_active=k, symmetrize=symmetrize
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile, m, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, m, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * tile, m, kp), f32),
        scratch_shapes=[
            pltpu.VMEM((tile, kp, kp), f32),
            pltpu.VMEM((tile, m, kp), f32),
            pltpu.VMEM((tile, kp), f32),
        ],
        interpret=interpret,
    )(c_p, r0p, r1p, r2p, rhs_p, diag)
    x = jnp.swapaxes(out[:i_pts, :, :k], 1, 2)  # [I, K, M]
    return x


def pallas_reduced_sweep(rm, ts: jax.Array, config) -> jax.Array:
    """Drop-in reduced sweep via the fused kernel + f64 refinement.

    Matches `morfem_tpu.mor.reduced.sweep` semantics: f32 elimination (the
    kernel) plus `config.refine_iterations` steps of iterative refinement
    with residuals computed as three [K,K]×[I,K,M] matmuls — the [I, K, K]
    system batch is never materialized in HBM.
    """
    from morfem_tpu.ops.orthonormalize import column_mask

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

    if config.refine_iterations > 0:
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

        x = jax.lax.fori_loop(0, config.refine_iterations, body, x)
    return x
