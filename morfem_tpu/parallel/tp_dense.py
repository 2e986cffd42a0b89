"""Tensor-parallel DENSE direct solves — Gauss-Jordan over the tp axis.

The reference's direct factorizations are single-node
(implementation.py:468-480). For N beyond a single chip's comfortable
HBM (an f32 N×N matrix is 4·N² bytes; three operators plus factors of a
100k-DOF dense system need several chips), this module distributes the
blocked Gauss-Jordan elimination (ops/blocked_inverse.py) COLUMN-sharded
over the mesh's ``tp`` axis:

  * each device owns a contiguous shard of columns of the working
    matrix (which converges to the composed elimination coefficients C);
  * for every width-``panel`` step, the owner factors its local panel
    (`gj_panel_factor` — the O(N·panel²) sequential part), and the
    (cp [N, panel], pivpanel [panel]) result is broadcast with one
    masked ``psum`` — the only communication of the step;
  * every device then applies the rank-``panel`` GEMM update to its own
    columns (the O(N²·panel) part — perfectly divided, f32-true via
    bf16 multi-word MXU passes);
  * the factor never leaves the mesh: applying A⁻¹ = Pᵀ(I + C·E) is one
    column-sharded GEMM + ``psum`` + two replicated gathers, and the f64
    iterative refinement around it uses the same distributed matvec for
    residuals.

Pivoting is the same masked partial pivoting as the single-chip GJ (the
pivot search runs over the full column, which the owner holds entirely —
no cross-device pivot exchange is ever needed; this is the payoff of the
column layout + no-row-swap design). Accuracy therefore matches
`gj_inverse_f32` exactly: the factor is ~cond·ε_f32 and the f64
refinement contracts to working precision.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from morfem_tpu.ops.blocked_inverse import gj_panel_factor
from morfem_tpu.ops.precision import matmul_f32_accurate


class TpGjFactor(NamedTuple):
    """Column-sharded Gauss-Jordan factor.

    c: [Np, Np] f32, sharded P(None, tp) — elimination coefficients
       (column j = the c-vector of elimination step j).
    pivrows: [Np] i32 replicated — pivot row of each step.
    d: [Np] working-dtype replicated — row equilibration scales.
    n: original (unpadded) size.
    """

    c: jax.Array
    pivrows: jax.Array
    d: jax.Array
    n: int


def _pad_to(a: jax.Array, np_: int) -> jax.Array:
    n0 = a.shape[0]
    if np_ == n0:
        return a
    pad = np_ - n0
    out = jnp.zeros((np_, np_), a.dtype)
    out = out.at[:n0, :n0].set(a)
    return out.at[n0:, n0:].set(jnp.eye(pad, dtype=a.dtype))


def tp_gj_factor(
    a: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel: int = 128,
    sub: int = 8,
) -> TpGjFactor:
    """Distributed GJ factorization of a real [N, N] matrix.

    ``a`` may arrive replicated or already column-sharded; it is padded
    to a multiple of ``panel × tp`` (identity on the pad) and row-
    equilibrated like `gj_inverse_f32`.
    """
    tp = mesh.shape[axis]
    n0 = a.shape[-1]
    if a.shape[-2] != n0:
        raise ValueError(f"square matrix required, got {a.shape}")
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise ValueError(
            "tp_gj_factor is real-only; lift complex operators through "
            "the real embedding first (ops/complex_split)"
        )
    step = panel * tp
    np_ = ((n0 + step - 1) // step) * step
    work_dtype = a.dtype

    # equilibration + padding on the host side of the shard_map
    d = jnp.max(jnp.abs(a), axis=-1)
    d = jnp.where(d == 0, jnp.ones((), a.dtype), d)
    a_eq = _pad_to((a / d[:, None]).astype(jnp.float32), np_)
    d_p = jnp.concatenate(
        [d, jnp.ones((np_ - n0,), d.dtype)]
    ).astype(work_dtype)

    fn = shard_map(
        lambda m: _factor_local(m, axis, panel, sub),
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=(P(None, axis), P()),
    )
    c, pivrows = jax.jit(fn)(a_eq)
    return TpGjFactor(c=c, pivrows=pivrows, d=d_p, n=n0)


def _factor_local(m_local, axis: str, panel: int, sub: int):
    """Per-device body of the distributed factorization (see module doc).

    m_local: [Np, Np/tp] f32 — this device's equilibrated column shard.
    Returns (c_local, pivrows) with pivrows replicated.
    """
    np_, shard_w = m_local.shape
    panels_per_shard = shard_w // panel
    npanels = np_ // panel
    my = lax.axis_index(axis)

    def panel_step(k, carry):
        m_l, avail, pivrows = carry
        owner = k // panels_per_shard
        local_k = k % panels_per_shard
        pb = lax.dynamic_slice(m_l, (0, local_k * panel), (np_, panel))
        # every device factors ITS slice at this local offset; only
        # the owner's result survives the masked psum broadcast.
        # avail is replicated state — cast it varying for the
        # device-local panel factorization (whose pivot choices
        # differ per device until the broadcast selects the owner's)
        avail_v = lax.pcast(avail, (axis,), to="varying")
        cp_mine, piv_mine, _ = gj_panel_factor(pb, avail_v, sub)
        # select-with-where, NOT multiply-by-mask: a non-owner's
        # panel can hit a zero pivot (NaN coefficients), and
        # NaN * 0 = NaN would poison the psum broadcast
        is_owner = my == owner
        cp = lax.psum(jnp.where(is_owner, cp_mine, 0.0), axis)
        pivpanel = lax.psum(jnp.where(is_owner, piv_mine, 0), axis)
        # rank-`panel` update of the local columns
        rows_m = jnp.take(m_l, pivpanel, axis=0)  # [panel, shard_w]
        m_l = m_l + matmul_f32_accurate(cp, rows_m)
        # the owner overwrites its panel columns with cp
        upd = lax.dynamic_update_slice(m_l, cp, (0, local_k * panel))
        m_l = jnp.where(my == owner, upd, m_l)
        avail = avail.at[pivpanel].set(False)
        pivrows = lax.dynamic_update_slice(
            pivrows, pivpanel, (k * panel,)
        )
        return m_l, avail, pivrows

    avail0 = jnp.ones((np_,), bool)
    piv0 = jnp.zeros((np_,), jnp.int32)
    m_l, _, pivrows = lax.fori_loop(
        0, npanels, panel_step, (m_local, avail0, piv0)
    )
    return m_l, pivrows


def tp_gj_apply(
    fac: TpGjFactor,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
) -> jax.Array:
    """x ≈ A⁻¹·b from the column-sharded factor (f32 apply).

    A⁻¹·b = D⁻¹·Pᵀ·(I + C·E)·(b) on the equilibrated system:
    z = b[pivrows] (replicated gather), y = b + C·z (column-sharded GEMM
    + psum), x = y[pivrows] (the Pᵀ gather), undone equilibration.
    """
    np_ = fac.c.shape[0]
    n0 = fac.n
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    b_eq = (b / fac.d[:n0, None]).astype(jnp.float32)
    b_p = jnp.zeros((np_, b.shape[1]), jnp.float32).at[:n0].set(b_eq)
    z = jnp.take(b_p, fac.pivrows, axis=0)  # [np_, M] replicated

    def local(c_local, z_local):
        return lax.psum(
            matmul_f32_accurate(c_local, z_local), axis
        )

    cz = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(axis, None)),
            out_specs=P(),
        )
    )(fac.c, z)
    y = b_p + cz
    x = jnp.take(y, fac.pivrows, axis=0)[:n0]
    x = x.astype(b.dtype)
    return x[:, 0] if squeeze else x


def tp_solve_dense(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel: int = 128,
    sub: int = 8,
    refine_iterations: int = 25,
    fac: Optional[TpGjFactor] = None,
) -> jax.Array:
    """Working-precision distributed dense solve: factor + f64 refinement.

    The refinement residuals use a column-sharded distributed matvec of
    the ORIGINAL matrix (HIGHEST-precision local GEMMs + psum — each
    local contraction is N/tp long, which also stays clear of the
    emulated-f64 accuracy cliff once tp ≥ N/2048).
    """
    if fac is None:
        fac = tp_gj_factor(a, mesh, axis=axis, panel=panel, sub=sub)
    x = tp_gj_apply(fac, b, mesh, axis=axis).astype(b.dtype)
    if refine_iterations <= 0 or not jnp.issubdtype(
        b.dtype, jnp.float64
    ):
        return x

    def mv_local(a_local, x_local):
        return lax.psum(
            jnp.matmul(
                a_local, x_local, precision=jax.lax.Precision.HIGHEST
            ),
            axis,
        )

    mv = jax.jit(
        shard_map(
            mv_local,
            mesh=mesh,
            in_specs=(P(None, axis), P(axis, None)),
            out_specs=P(),
        )
    )

    r = b - mv(a, x)
    r_norm = jnp.linalg.norm(r)
    tol = 10 * jnp.finfo(b.dtype).eps * jnp.linalg.norm(b)
    prev = jnp.inf
    # host-driven adaptive loop (one factor serves many solves; each
    # iteration is one distributed apply + one distributed matvec)
    for _ in range(refine_iterations):
        if not (float(r_norm) > float(tol) and float(r_norm) < 0.95 * float(prev)):
            break
        x = x + tp_gj_apply(fac, r, mesh, axis=axis).astype(b.dtype)
        prev = r_norm
        r = b - mv(a, x)
        r_norm = jnp.linalg.norm(r)
    return x


def tp_solve_dense_compiled(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
    panel: int = 128,
    sub: int = 8,
    refine_iterations: int = 25,
) -> jax.Array:
    """One-shot distributed dense solve as ONE compiled program.

    Unlike `tp_solve_dense` (factor once, host-driven refinement — the
    right shape when one factorization serves many right-hand sides),
    this fuses equilibration, factorization, apply and the adaptive f64
    refinement `lax.while_loop` into a single jitted shard_map: zero
    host round-trips after dispatch, which matters when the host↔device
    link carries ~30 ms latency (the axon tunnel). Real f64 systems
    only.
    """
    tp = mesh.shape[axis]
    n0 = a.shape[-1]
    if a.shape[-2] != n0:
        raise ValueError(f"square matrix required, got {a.shape}")
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        raise ValueError(
            "tp_solve_dense_compiled is real-only; lift complex "
            "operators through the real embedding first "
            "(ops/complex_split)"
        )
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    step = panel * tp
    np_ = ((n0 + step - 1) // step) * step
    work = jnp.result_type(a.dtype, b.dtype)

    def local(a_loc, b_p):
        # a_loc [np_, np_/tp] working dtype; b_p [np_, M] replicated
        my = lax.axis_index(axis)
        shard_w = a_loc.shape[1]
        # global row maxima for equilibration: local row max + pmax
        d_loc = jnp.max(jnp.abs(a_loc), axis=1)
        d = lax.pmax(d_loc, axis)
        d = jnp.where(d == 0, jnp.ones((), d.dtype), d)
        a_eq32 = (a_loc / d[:, None]).astype(jnp.float32)
        c_loc, pivrows = _factor_local(a_eq32, axis, panel, sub)

        def apply_inv(r):
            # x ← B⁻¹·(r/d) = A⁻¹·r on the replicated [np_, M] residual
            r_eq = (r / d[:, None]).astype(jnp.float32)
            z = jnp.take(r_eq, pivrows, axis=0)
            z_loc = lax.dynamic_slice(
                z, (my * shard_w, jnp.zeros((), my.dtype)),
                (shard_w, z.shape[1]),
            )
            y = r_eq + lax.psum(matmul_f32_accurate(c_loc, z_loc), axis)
            return jnp.take(y, pivrows, axis=0).astype(work)

        def matvec(x):
            x_loc = lax.dynamic_slice(
                x, (my * shard_w, jnp.zeros((), my.dtype)),
                (shard_w, x.shape[1]),
            )
            return lax.psum(
                jnp.matmul(
                    a_loc, x_loc, precision=jax.lax.Precision.HIGHEST
                ),
                axis,
            )

        x0 = apply_inv(b_p)
        if refine_iterations <= 0 or jnp.finfo(work).bits <= 32:
            return x0
        tol = 10 * jnp.finfo(work).eps * jnp.linalg.norm(b_p)

        def cond_fn(state):
            _, _, r_norm, r_prev, it = state
            improving = r_norm < 0.95 * r_prev
            return jnp.logical_and(
                jnp.logical_and(r_norm > tol, improving),
                it < refine_iterations,
            )

        def body_fn(state):
            x, r, r_norm, _, it = state
            x = x + apply_inv(r)
            r_new = b_p - matvec(x)
            return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

        r0 = b_p - matvec(x0)
        state = (
            x0, r0, jnp.linalg.norm(r0),
            jnp.asarray(jnp.inf, x0.real.dtype), jnp.asarray(0),
        )
        x, _, _, _, _ = lax.while_loop(cond_fn, body_fn, state)
        return x

    @jax.jit
    def run(a, b):
        a_p = _pad_to(a, np_)
        b_p = jnp.zeros((np_, b.shape[1]), work).at[:n0].set(b)
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P()),
            out_specs=P(),
        )
        return fn(a_p, b_p)[:n0]

    x = run(a.astype(work), b.astype(work))
    return x[:, 0] if squeeze else x
