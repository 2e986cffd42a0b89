"""Reduced-order model: Galerkin projection and the batched reduced sweep.

The reference projects in place — ``md_r = md; md_r.a0 = q.T @ md.a0 @ q; …``
(implementation.py:179-184) — then re-runs the same per-point Python solve
loop on the small dense matrices (implementation.py:186, :189-194).

TPU-native design:

* ``ReducedModel`` is an immutable pytree holding the projection basis Q
  (padded to a static column count K with `ncols` active), the reduced
  operators R_i = Qᴴ·A_i·Q, the reduced impulse part b_r = Qᴴ·B, the domain
  and the coefficient callables. It is exactly the "natural checkpoint"
  artifact: persist it and re-sweep any grid without touching the
  full-order system.
* The reduced sweep assembles ALL I reduced systems at once
  ([I, K, K] = Σ c_i(t)·R_i) and solves them as one batched LU — one XLA
  op instead of I Python iterations. Inactive (padding) rows/columns are
  given an identity diagonal so the factorization stays nonsingular; their
  solution entries are exactly zero because the padded RHS rows are zero.

Note on transposes: the projection uses the PLAIN transpose ``q.T``,
exactly like the reference (implementation.py:180-184) — and deliberately
so, not just for parity. Frequency-domain FEM systems are complex
*symmetric* (not Hermitian), and three things only stay consistent with a
plain-transpose (bilinear-form) Galerkin projection:
  * the reduced matrices remain complex-symmetric, so the reference's
    symmetrization ``(A_r + A_rᵀ)/2`` is harmless (with a Hermitian
    projection it would zero the imaginary part — Hermitian matrices have
    antisymmetric imaginary parts);
  * the GSM consistency identity ``x_rᵀ·(Qᵀb) ≡ (Q·x_r)ᵀ·b``
    (test_helpers.py:60-65) holds;
  * results are bit-identical to the reference on real data.
Norm/orthogonality computations (SVD, Gram-Schmidt, the estimator's Gram
blocks) keep Hermitian inner products — those are norms, not projections.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.orthonormalize import column_mask
from morfem_tpu.ops.precision import precise_matmul
from morfem_tpu.ops.solve import factor_dtype_like
from morfem_tpu.system import AffineSystem, Coefficient

_HI = jax.lax.Precision.HIGHEST  # see mor/estimator.py on TPU f64 matmuls


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReducedModel:
    """Projected (reduced-order) model — an immutable pytree.

    Shapes: q [N, K]; r0/r1/r2 [K, K]; b_r [K, M]; domain [I]; ncols is the
    number of active basis columns (≤ K; the rest is padding).
    """

    domain: jax.Array
    q: jax.Array
    r0: jax.Array
    r1: jax.Array
    r2: jax.Array
    b_r: jax.Array
    ncols: jax.Array
    t_a0: Coefficient = dataclasses.field(metadata=dict(static=True))
    t_a1: Coefficient = dataclasses.field(metadata=dict(static=True))
    t_a2: Coefficient = dataclasses.field(metadata=dict(static=True))
    t_b: Coefficient = dataclasses.field(metadata=dict(static=True))
    # addends BEYOND the classic 3-term pencil (reference fixes P=3;
    # complex-coefficient systems ride the interleaved embedding as P=6,
    # mor/api.py) — r_extra[j] pairs with t_extra[j]
    r_extra: Tuple[jax.Array, ...] = ()
    t_extra: Tuple[Coefficient, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    @property
    def k(self) -> int:
        return self.q.shape[1]

    @property
    def m(self) -> int:
        return self.b_r.shape[1]

    def coefficients(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        t = jnp.asarray(t)
        ones = jnp.ones_like(t)
        fns = (self.t_a0, self.t_a1, self.t_a2) + self.t_extra
        c = jnp.stack(
            [jnp.broadcast_to(fn(t), t.shape) * ones for fn in fns],
            axis=-1,
        )
        cb = jnp.broadcast_to(self.t_b(t), t.shape)
        return c, cb

    def trim(self) -> "ReducedModel":
        """Host-side: slice away padding columns (one device→host sync)."""
        nc = int(self.ncols)
        return dataclasses.replace(
            self,
            q=self.q[:, :nc],
            r0=self.r0[:nc, :nc],
            r1=self.r1[:nc, :nc],
            r2=self.r2[:nc, :nc],
            b_r=self.b_r[:nc],
            ncols=jnp.asarray(nc),
            r_extra=tuple(r[:nc, :nc] for r in self.r_extra),
        )


def project(
    sys: AffineSystem, q: jax.Array, ncols: jax.Array | None = None
) -> ReducedModel:
    """Galerkin-project the affine system onto basis q.

    Counterpart of reference implementation.py:179-184. ``q`` may be padded
    ([N, K] with `ncols` active columns, the rest zero) or exact
    (ncols = K). The three projections share the intermediate U_i = A_i·Q,
    so each costs one [N,N]×[N,K] and one [K,N]×[N,K] matmul on the MXU.
    """
    if ncols is None:
        ncols = jnp.asarray(q.shape[1])
    qt = q.T  # plain transpose — see module docstring

    def proj(a):
        return precise_matmul(qt, precise_matmul(a, q))

    r0 = proj(sys.a0)
    r1 = proj(sys.a1)
    r2 = proj(sys.a2)
    b_r = precise_matmul(qt, sys.b)
    return ReducedModel(
        domain=sys.domain,
        q=q,
        r0=r0,
        r1=r1,
        r2=r2,
        b_r=b_r,
        ncols=ncols,
        t_a0=sys.t_a0,
        t_a1=sys.t_a1,
        t_a2=sys.t_a2,
        t_b=sys.t_b,
    )


def assemble_reduced(
    rm: ReducedModel,
    ts: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> Tuple[jax.Array, jax.Array]:
    """Assemble the batch of reduced systems (A_r(t), b_r(t)) for points ts.

    Returns ([I, K, K], [I, K, M]) with identity padding on inactive
    diagonal entries (keeps the batched LU nonsingular; padded solution
    rows come out exactly zero).
    """
    c, cb = rm.coefficients(ts)
    a = (
        c[..., 0, None, None] * rm.r0
        + c[..., 1, None, None] * rm.r1
        + c[..., 2, None, None] * rm.r2
    )
    for j, rj in enumerate(rm.r_extra):
        a = a + c[..., 3 + j, None, None] * rj
    if config.symmetrize:
        a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    mask = column_mask(rm.k, rm.ncols, a.dtype)
    a = a + jnp.diag(1.0 - mask)
    rhs = cb[..., None, None] * (rm.b_r * mask[:, None])
    return a, rhs


def solve_reduced_batch(
    a: jax.Array,
    rhs: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> jax.Array:
    """Batched dense LU solve of [..., K, K] systems with refinement."""
    work_dtype = jnp.result_type(a.dtype, rhs.dtype)
    fd = factor_dtype_like(work_dtype, config.factor_dtype_name)
    lu, piv = jsl.lu_factor(a.astype(fd))
    x = jsl.lu_solve((lu, piv), rhs.astype(fd)).astype(work_dtype)
    if config.refine_iterations > 0 and jnp.finfo(work_dtype).bits > jnp.finfo(fd).bits:
        a_w, rhs_w = a.astype(work_dtype), rhs.astype(work_dtype)
        rdtype = jnp.zeros((), work_dtype).real.dtype
        b_norm = jnp.linalg.norm(rhs_w)
        tol = 10 * jnp.finfo(work_dtype).eps * b_norm

        # adaptive refinement with a batch-global criterion: well-
        # conditioned reduced systems converge in 2-3 steps; the cap only
        # binds near resonances (mirrors ops/solve.lu_solve_refined)
        def cond_fn(state):
            _, _, r_norm, r_prev, it = state
            improving = r_norm < 0.95 * r_prev
            return jnp.logical_and(
                jnp.logical_and(r_norm > tol, improving),
                it < config.refine_iterations,
            )

        def body_fn(state):
            x, r, r_norm, _, it = state
            d = jsl.lu_solve((lu, piv), r.astype(fd))
            x = x + d.astype(work_dtype)
            r_new = rhs_w - jnp.matmul(a_w, x, precision=_HI)
            return (x, r_new, jnp.linalg.norm(r_new), r_norm, it + 1)

        r0 = rhs_w - jnp.matmul(a_w, x, precision=_HI)
        state = (
            x, r0, jnp.linalg.norm(r0), jnp.asarray(jnp.inf, rdtype),
            jnp.asarray(0),
        )
        x, _, _, _, _ = lax.while_loop(cond_fn, body_fn, state)
    return x


def sweep(
    rm: ReducedModel,
    config: MorfemConfig = DEFAULT_CONFIG,
    ts: jax.Array | None = None,
) -> jax.Array:
    """Sweep the reduced model over the domain (or a custom grid).

    Counterpart of running ``solve_finite_element_method`` on the reduced
    ModelDefinition (reference: implementation.py:186, :189-194) — but as a
    single batched assemble + batched LU instead of I sequential solves.

    Returns x with shape [I, K, M] (padded rows are zero).
    """
    if ts is None:
        ts = rm.domain
    if config.use_pallas_reduced_sweep:
        from morfem_tpu.ops.pallas.reduced_sweep import pallas_reduced_sweep

        return pallas_reduced_sweep(rm, ts, config)
    a, rhs = assemble_reduced(rm, ts, config)
    return solve_reduced_batch(a, rhs, config)
