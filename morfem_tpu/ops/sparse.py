"""Sparse operators (BCOO) and iterative solvers for very large N.

The reference keeps operators in SciPy CSC and solves with the sparse
direct `splu` (implementation.py:474-476). TPU has no sparse direct
factorization; this framework's scaling story for N beyond dense-LU reach
(~30k DOF dense f32 LU ≈ 3.6 GB per factorization) is:

  * operators as `jax.experimental.sparse` BCOO (COO blocks — the TPU
    sparse format; SpMV/SpMM lower to gather/segment-sum),
  * snapshot solves dispatched by structure (`solve_point_iterative`,
    method="auto"): BANDED operators take the block-tridiagonal DIRECT
    elimination (ops/block_tridiag — handles the strongly indefinite
    in-band Helmholtz systems C − k²T where any Jacobi-Krylov method
    stagnates, verified at N=34k on-chip); general sparsity takes
    Jacobi-preconditioned block Krylov (BiCGStab default — the swept
    system is symmetric but indefinite near resonances, so plain CG is
    not safe; GMRES available). Krylov callers get the achieved residual
    back so non-convergence is detected, never silently consumed,
  * the same snapshot → projection → reduced-sweep pipeline on top: the
    estimator and projection already only need operator *applications*
    (U_p = A_p·Q), which are SpMM here.

N-axis sharding of the SpMM composes with `shard_map` the same way the
dense path does (`morfem_tpu.parallel.sharded`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.utils.pytreereg import register_operator_pytree


def to_bcoo(a, dtype=None, nse: Optional[int] = None) -> jsparse.BCOO:
    """Convert dense / SciPy sparse to BCOO."""
    if isinstance(a, jsparse.BCOO):
        return a
    if hasattr(a, "tocoo"):  # SciPy sparse
        coo = a.tocoo()
        data = jnp.asarray(coo.data, dtype)
        idx = jnp.stack(
            [jnp.asarray(coo.row), jnp.asarray(coo.col)], axis=1
        ).astype(jnp.int32)
        return jsparse.BCOO((data, idx), shape=coo.shape)
    return jsparse.BCOO.fromdense(jnp.asarray(a, dtype), nse=nse)


class SparseAffineOperator:
    """A(t)·x applications for BCOO operator addends.

    Mirrors `system_matrix` (implementation.py:526-528) as a matrix-free
    operator: symmetrization (A+Aᵀ)/2 is applied per-matvec using the
    transposed SpMM, so no symmetrized matrix is ever materialized.
    """

    def __init__(self, *mats, symmetrize: bool = True):
        self.ops = tuple(to_bcoo(a) for a in mats)
        self.ops_t = tuple(op.T for op in self.ops) if symmetrize else None
        self.symmetrize = symmetrize

    @property
    def n_addends(self) -> int:
        return len(self.ops)

    def matvec(self, c: jax.Array, x: jax.Array) -> jax.Array:
        """y = A(t)·x with coefficients c = [c0, …, c_{P−1}]; x [N] or [N, M]."""
        y = jnp.zeros_like(x)
        for p, op in enumerate(self.ops):
            y = y + c[p] * (op @ x)
        if self.symmetrize:
            yt = jnp.zeros_like(x)
            for p, op_t in enumerate(self.ops_t):
                yt = yt + c[p] * (op_t @ x)
            y = (y + yt) * 0.5
        return y

    def apply_addend(self, p: int, x: jax.Array) -> jax.Array:
        """A_p·x for one operator addend (symmetrized like `matvec`).

        The per-addend application the matrix-free greedy's estimator
        needs (U_p = A_p·Q, mor/greedy_matfree.py) — one SpMM (plus the
        transposed SpMM under symmetrization) instead of probing `matvec`
        with unit coefficient vectors, which would run all three addends.
        """
        y = self.ops[p] @ x
        if self.symmetrize:
            y = (y + self.ops_t[p] @ x) * 0.5
        return y

    def diagonal(self, c: jax.Array) -> jax.Array:
        """diag(A(t)) for the Jacobi preconditioner."""
        n = self.ops[0].shape[0]
        diags = []
        for op in self.ops:
            rows, cols = op.indices[:, 0], op.indices[:, 1]
            d = jnp.zeros((n,), op.data.dtype).at[rows].add(
                jnp.where(rows == cols, op.data, 0.0)
            )
            diags.append(d)
        return sum(c[p] * diags[p] for p in range(len(diags)))


class GeneralSparseOperator:
    """Exact sparse applies + truncated-band shifted-direct preconditioning.

    The operator for sparsity that RCM cannot make banded
    (`BandwidthError`): applies/residuals go through the exact operator —
    a dense-block `BlockSparseAffineOperator` (MXU contractions,
    ops/block_sparse.py) when the pattern blocks well, else the
    element-wise `SparseAffineOperator`; solves run preconditioned GMRES with the
    shifted block-direct factorization of the RCM in-band part
    (ops/block_tridiag.py::general_sparse_solve) — robust on indefinite
    systems where the plain Jacobi-Krylov fallback stagnates.

    Build with `ops.block_tridiag.truncated_band_via_rcm` (which also
    returns the row permutation to apply to RHS/solutions).
    """

    def __init__(self, exact_op, band_op, sigma: float = 1e-4,
                 dropped: float = 0.0):
        self.exact = exact_op
        self.band = band_op
        self.sigma = sigma
        self.dropped = dropped

    @property
    def n_addends(self) -> int:
        return self.exact.n_addends

    def matvec(self, c, x):
        return self.exact.matvec(c, x)

    def apply_addend(self, p, x):
        return self.exact.apply_addend(p, x)

    def diagonal(self, c):
        return self.exact.diagonal(c)


# Registered as pytrees so solvers can take the operator as a jit ARGUMENT
# (buffers as parameters, not HLO constants — see utils/pytreereg.py; the
# closure form overflowed the remote-compile request at N=9000).
register_operator_pytree(
    SparseAffineOperator, ("ops", "ops_t"), ("symmetrize",)
)
register_operator_pytree(
    GeneralSparseOperator, ("exact", "band"), ("sigma", "dropped")
)


def solve_point_iterative(
    op: SparseAffineOperator,
    c: jax.Array,  # [3] coefficients at this point
    rhs: jax.Array,  # [N, M]
    tol: float = 1e-10,
    maxiter: int = 2000,
    method: str = "auto",
    return_residual: bool = False,
):
    """Matrix-free solve of A(t)·x = rhs — the large-N snapshot path.

    Replaces `splu` (implementation.py:474-476) where dense LU no longer
    fits. Methods:

    - ``"direct"`` — block-tridiagonal elimination + f64 refinement
      (ops/block_tridiag), banded operators only. The robust choice: it
      handles the strongly indefinite in-band Helmholtz systems where
      every Jacobi-Krylov method stagnates.
    - ``"bicgstab"`` / ``"gmres"`` — Jacobi-preconditioned block Krylov;
      fine for definite / diagonally dominant systems, and the only
      option for non-banded general sparsity.
    - ``"general"`` — exact-operator GMRES with the truncated-band
      shifted-direct preconditioner (`GeneralSparseOperator`); the
      robust path for indefinite systems with non-band-recoverable
      sparsity.
    - ``"spike"`` — the banded direct solve DISTRIBUTED over a device
      mesh (`parallel/tp_banded.py`); operators carrying a
      ``spike_mesh`` (`SpikeBandedOperator`) only.
    - ``"auto"`` (default) — ``spike`` when the operator carries a mesh,
      ``direct`` when it carries banded storage (`BandedAffineOperator`),
      ``general`` for a `GeneralSparseOperator`, else ``bicgstab``.

    With ``return_residual`` also returns the achieved relative residual
    per column — Krylov methods on strongly indefinite systems can
    stagnate, and jax's solvers do not raise.
    """
    if method == "auto":
        if hasattr(op, "spike_mesh"):
            method = "spike"
        elif hasattr(op, "bands_w"):
            method = "direct"
        elif hasattr(op, "band"):
            method = "general"
        else:
            method = "bicgstab"
    if method == "spike":
        # distributed banded direct solve over the operator's mesh
        # (parallel/tp_banded.py — the TP-scale splu robustness story)
        x, relres, _ = op.spike_solve(
            c, rhs, tol=tol, refine_iterations=min(30, maxiter)
        )
        return (x, relres) if return_residual else x
    if method == "general":
        from morfem_tpu.ops.block_tridiag import general_sparse_solve

        x, relres = general_sparse_solve(
            op.exact, op.band, c, rhs, sigma=op.sigma, tol=tol,
            maxiter=max(2, maxiter // 32),
        )
        return (x, relres) if return_residual else x
    if method == "direct":
        from morfem_tpu.ops.block_tridiag import banded_direct_solve

        # tol is forwarded as the refinement's relative-residual target;
        # maxiter (a Krylov iteration budget) caps the f64 refinement
        # steps — a caller bounding work with a small maxiter gets a
        # genuinely bounded solve, not the unrelated default cap
        x, relres, _ = banded_direct_solve(
            op, c, rhs, tol=tol, refine_iterations=min(30, maxiter)
        )
        return (x, relres) if return_residual else x
    diag = op.diagonal(c)
    safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)

    # `bind` (when offered) combines the operator for these coefficients
    # ONCE, keeping the (large) bound operand a hoisted loop constant
    mv = op.bind(c) if hasattr(op, "bind") else (lambda x: op.matvec(c, x))

    def precond(x):
        return x / (safe[:, None] if x.ndim == 2 else safe)

    if method == "gmres":
        from morfem_tpu.ops.krylov import gmres

        x, _ = gmres(mv, rhs, precond=precond, tol=tol,
                     maxiter=max(1, maxiter // 32), restart=32)
    else:
        # block BiCGStab over all columns at once: one matvec per iteration
        # serves every RHS, and no vmap touches the (possibly Pallas)
        # operator — see ops/krylov.py for why jax.scipy's solver can't be
        # used here
        from morfem_tpu.ops.krylov import bicgstab

        x, _ = bicgstab(mv, rhs, precond=precond, tol=tol, maxiter=maxiter)
        if hasattr(op, "bind_precise"):
            # the fast matvec may be f32 (Pallas kernel): polish with a few
            # outer refinement steps whose residuals use the working-dtype
            # reference matvec (cheap elementwise work)
            mv_precise = op.bind_precise(c)
            for _ in range(3):
                r = rhs - mv_precise(x.astype(rhs.dtype))
                d, _ = bicgstab(mv, r.astype(x.dtype), precond=precond,
                                tol=1e-4, maxiter=maxiter)
                x = x.astype(rhs.dtype) + d.astype(rhs.dtype)
    if return_residual:
        mv_res = op.bind_precise(c) if hasattr(op, "bind_precise") else (
            lambda v: op.matvec(c, v)
        )
        r = rhs - mv_res(x)
        relres = jnp.linalg.norm(r, axis=0) / jnp.maximum(
            jnp.linalg.norm(rhs, axis=0), 1e-300
        )
        return x, relres
    return x


def sparse_snapshot_basis(
    mats,
    b: jax.Array,
    domain: jax.Array,
    seed_indices: jax.Array,
    coeffs,
    config: MorfemConfig = DEFAULT_CONFIG,
    tol: float = 1e-10,
    method: str = "auto",
    op=None,
) -> jax.Array:
    """Equally-distributed snapshot basis with iterative large-N solves.

    ``mats`` is the sequence of P operator addends and ``coeffs`` the
    matching P coefficient callables plus t_b last (the classic pencil is
    P=3). Pass ``op`` (e.g. a `BandedAffineOperator`) to reuse prepared
    operator storage and unlock ``method="auto"``'s direct banded path;
    by default a `SparseAffineOperator` (BCOO) is built from ``mats``.

    Returns the orthonormal basis q [N, S·M]. The downstream projection /
    reduced sweep reuse the dense pipeline (the reduced model is dense and
    tiny regardless of N).
    """
    from morfem_tpu.ops.orthonormalize import orthonormalize_svd

    t_ops, t_b = tuple(coeffs[:-1]), coeffs[-1]
    if len(t_ops) != len(mats):
        raise ValueError(
            f"{len(mats)} operator addends need {len(mats)} + 1 coefficient "
            f"callables, got {len(coeffs)}"
        )
    if op is None:
        op = SparseAffineOperator(*mats, symmetrize=config.symmetrize)
    ts = domain[seed_indices]

    # jit ONCE across all seed points, with the operator passed as a
    # pytree ARGUMENT (utils/pytreereg.py): eager per-point dispatch pays
    # per-op device latency — observed 3.5 s vs 54 ms for a single N=34k
    # banded direct solve — while CLOSING over the operator would embed
    # its buffers as HLO constants and overflow the remote-compile
    # request at large N (HTTP 413 at N=9000, round 3)
    @jax.jit
    def _solve(op, t):
        c = jnp.stack(
            [jnp.asarray(fn(t), dtype=b.dtype) for fn in t_ops]
        )
        rhs = jnp.asarray(t_b(t), dtype=b.dtype) * b
        x, relres = solve_point_iterative(
            op, c, rhs, tol=tol, method=method, return_residual=True
        )
        return x, relres, c, rhs

    @jax.jit
    def _solve_shifted(op, c, rhs):
        from morfem_tpu.ops.block_tridiag import shifted_gmres_solve

        return shifted_gmres_solve(op, c, rhs, tol=tol, maxiter=60)

    snaps = []
    worst = 0.0
    for i in range(ts.shape[0]):
        x, relres, c, rhs = _solve(op, ts[i])
        point_worst = float(jnp.max(relres))
        # NaN residuals (Krylov breakdown on indefinite systems) must
        # escalate too — note NaN > x is False, so compare negatively
        failed = not (point_worst <= max(tol * 100, 1e-8))
        if failed and hasattr(op, "bands_w"):
            # near-resonance escalation: the σ-shifted factorization's
            # condition is bounded by ~1/σ (f32-safe) where the unshifted
            # one's refinement stagnates — see ops/block_tridiag
            x, relres = _solve_shifted(op, c, rhs)
            point_worst = float(jnp.max(relres))
        # NaN-propagating aggregation: max(worst, nan) would KEEP the old
        # worst (nan > x is False) and the warning below would never fire
        if not (point_worst <= worst):
            worst = point_worst
        snaps.append(x)
    if worst > max(tol * 100, 1e-8):
        import warnings

        hint = ""
        if getattr(op, "dropped", 0.0) > 0.01:
            # a weak truncated-band preconditioner is the usual culprit:
            # its quality is bounded by the out-of-band mass it drops
            hint = (
                f" The in-band preconditioner drops {op.dropped:.1%} of "
                "the operator's mass — raising config.band_max_half "
                "should restore convergence."
            )
        warnings.warn(
            f"iterative snapshot solves reached only {worst:.1e} relative "
            "residual — the operator is likely strongly indefinite; the "
            "basis may be unusable (consider the dense path or a better "
            f"preconditioner).{hint}",
            stacklevel=2,
        )
    q = jnp.concatenate(snaps, axis=1)
    return orthonormalize_svd(q)


def sparse_project(mats, b, q: jax.Array):
    """Galerkin projection with SpMM images — r_p = Qᴴ·(A_p·Q), b_r = Qᴴ·B.

    ``mats`` is the sequence of P operator addends; returns (P-tuple of
    [K, K] reduced matrices, b_r)."""
    ops = tuple(to_bcoo(a) for a in mats)
    qt = q.T  # plain transpose (see mor/reduced.py docstring)
    rs = tuple(
        jnp.matmul(qt, op @ q, precision=jax.lax.Precision.HIGHEST)
        for op in ops
    )
    b_r = jnp.matmul(
        qt, jnp.asarray(b), precision=jax.lax.Precision.HIGHEST
    )
    return rs, b_r
