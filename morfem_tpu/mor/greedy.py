"""Greedy projection-basis construction — fully compiled.

Counterpart of the reference's ``projection_base`` loop
(implementation.py:217-318): seed the basis with snapshots at the first and
last domain points, then repeatedly (1) estimate the residual norm over the
whole domain, (2) take a full-order snapshot at the worst point, (3)
re-orthonormalize — until the max estimate drops below the threshold.

TPU-native redesign: the basis size grows dynamically, which XLA cannot
express with growing shapes. Instead Q lives in a padded [N, K] buffer
(K = columns for the 2 seed snapshots + `max_greedy_iterations` refinement
snapshots) with an active-column count, and the whole loop runs as ONE
`lax.while_loop` on device: estimator (batched), argmax, N×N snapshot LU,
orthonormalization — no host round-trips until the final result is read.

The reference's USE_OPM incremental Gram machinery
(implementation.py:230-263, :275-295) has no counterpart here because the
redesigned estimator makes recomputation cheaper than the reference's
increments (see morfem_tpu.mor.estimator docstring).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.estimator import (
    estimate_errors,
    estimate_errors_direct,
    estimator_blocks,
    operator_images,
)
from morfem_tpu.mor.reduced import ReducedModel
from morfem_tpu.ops.orthonormalize import (
    column_mask,
    orthonormalize_append_cgs2,
    orthonormalize_svd_masked,
)
from morfem_tpu.ops.precision import (
    precise_matmul_chunked,
    precise_matmul_many,
)
from morfem_tpu.ops.solve import solve_point
from morfem_tpu.system import AffineSystem

_HI = jax.lax.Precision.HIGHEST  # see mor/estimator.py on TPU f64 matmuls


class GreedyState(NamedTuple):
    q: jax.Array  # [N, K] padded basis
    ncols: jax.Array  # active columns
    seeded: jax.Array  # seed snapshots taken (loop starts estimating at 2)
    it: jax.Array  # completed estimator evaluations
    err_hist: jax.Array  # [max_iters + 1, I] estimator history
    converged: jax.Array  # bool: max estimator error < threshold
    done: jax.Array  # bool: converged OR column budget exhausted


class GreedyResult(NamedTuple):
    q: jax.Array  # [N, K] padded orthonormal basis
    ncols: jax.Array  # active columns
    iterations: jax.Array  # number of estimator evaluations performed
    converged: jax.Array  # bool
    err_hist: jax.Array  # [max_iters + 1, I]; rows ≥ iterations are zero
    # True when the loop aborted because a seed/snapshot SOLVE was
    # unhealthy (matfree route, greedy_matfree.py) — a different failure
    # from budget exhaustion/stagnation, and raising the iteration budget
    # won't fix it; morfem()'s unconverged warning names the right cause
    failed_snapshot: bool = False


def max_basis_columns(m: int, config: MorfemConfig, n: int | None = None) -> int:
    """Static padded basis width: 2 seed snapshots + one per greedy iter.

    Clamped to N — a basis can never exceed N independent columns, and a
    padded buffer wider than N would break the thin-SVD orthonormalization.
    """
    k = (2 + config.max_greedy_iterations) * m
    if n is not None:
        k = min(k, n)
    return max(k, 2 * m)


def _reduced_from_u(
    sys: AffineSystem, q: jax.Array, ncols: jax.Array, u: jax.Array
) -> ReducedModel:
    """Build the reduced model reusing U_i = A_i·Q from the estimator.

    Plain-transpose projection, like `project` (see mor/reduced.py's module
    docstring for why the bilinear form is the right one).
    """
    mask = column_mask(q.shape[1], ncols, q.dtype)
    qmt = (q * mask).T
    # one concatenated CHUNKED product serves all four projections: same
    # ~1e-15 accuracy class as the ozaki apply it replaces, ~1.4 s of XLA
    # compile instead of ~10 s inside the greedy while_loop (round-4
    # ablation: _reduced_from_u 10.4 s -> the chunked trade), and the
    # [K,N]@[N,3K+M] emulated-f64 runtime is ~ms at greedy shapes
    r0, r1, r2, b_r = precise_matmul_many(
        qmt, (u[0], u[1], u[2], sys.b), impl="chunked"
    )
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


def greedy_basis(
    sys: AffineSystem, config: MorfemConfig = DEFAULT_CONFIG
) -> GreedyResult:
    """Run the greedy loop; returns the padded orthonormal basis.

    Reference parity notes:
      * seeds = snapshots at domain[0] and domain[-1], orthonormalized by
        thin SVD (implementation.py:222-226);
      * per-iteration convergence check `max(err) < error_threshold`
        (implementation.py:321-328);
      * the error history row is recorded for every estimator evaluation,
        including the final converged one (implementation.py:265-271).

    The system always crosses a jit boundary as an ARGUMENT (config is the
    static key). Calling the loop eagerly would close over the operators —
    and on TPU their pre-split Ozaki slices, ~0.5 GB of bf16 — as HLO
    CONSTANTS: measured round 3, that inflates the remote-compile request
    past the axon service's size limit (HTTP 413) for subgraphs and runs
    ~37× slower end-to-end than the same loop with parameter inputs.
    """
    return _greedy_jitted(config)(sys)


@functools.lru_cache(maxsize=64)
def _greedy_jitted(config: MorfemConfig):
    return jax.jit(functools.partial(_greedy_basis_impl, config=config))


def _greedy_basis_impl(
    sys: AffineSystem, config: MorfemConfig = DEFAULT_CONFIG
) -> GreedyResult:
    m = sys.m
    n = sys.n
    k = max_basis_columns(m, config, n)
    i = sys.num_points
    max_iters = config.max_greedy_iterations
    # solutions live in the dtype promoted across operators AND coefficient
    # values (complex-valued coefficient callables are allowed)
    c_probe, cb_probe = sys.coefficients(sys.domain[:1])
    dtype = jnp.result_type(sys.dtype, c_probe.dtype, cb_probe.dtype)
    rdtype = jnp.zeros((), dtype).real.dtype

    # Hoisted operand splits (r2 verdict item #3 — the greedy cold
    # compile): the Ozaki split of each loop-INVARIANT operator is built
    # once here; the loop body then traces only the compact applies.
    # `shared_raw` feeds the estimator's U_p images (raw-operator
    # semantics, see mor/estimator.py); `shared_sym` the snapshot-solve
    # refinement residuals (which see the assembled/symmetrized A(t)).
    from morfem_tpu.ops.assembly import SharedAffineApply

    if jnp.issubdtype(dtype, jnp.complexfloating):
        # complex working dtype (complex coefficient callables, or a
        # CPU-native complex run): the hoisted ozaki applies are
        # real-only — their f64 cast would drop imaginary parts
        # (assembly.py raises). The solvers' local precise_matmul
        # handles complex correctly.
        shared_raw = shared_sym = None
    else:
        shared_raw = SharedAffineApply(sys.operators(), symmetrize=False)
        # symmetric_ops: (A+Aᵀ)/2 is a bit-exact no-op, so the estimator
        # and the snapshot-solve refinement share ONE hoisted operand
        # split — one ozaki_prepare + apply instance in the loop trace
        # instead of two
        shared_sym = (
            SharedAffineApply(sys.operators(), symmetrize=True)
            if config.symmetrize and not sys.symmetric_ops
            else shared_raw
        )
        if shared_raw.preps is None:
            shared_raw = shared_sym = None  # off the ozaki path: the
            # solvers then use their local accurate matmuls

    # The two SEED snapshots (domain[0], domain[-1] —
    # implementation.py:222-226) run through the SAME while_loop body as
    # the greedy refinement snapshots (iterations with ncols < 2m skip
    # the estimator and pin t_star to the seed points): a separate seed
    # solve instance would re-trace the whole LU + adaptive-refinement
    # subgraph, which measurably costs ~30 s of the cold XLA compile
    # (round-3 ablation: solve_batch 29.5 s, the full greedy 120.4 s).
    init = GreedyState(
        q=jnp.zeros((n, k), dtype),
        ncols=jnp.asarray(0),
        seeded=jnp.asarray(0),
        it=jnp.asarray(0),
        err_hist=jnp.zeros((max_iters + 1, i), rdtype),
        converged=jnp.asarray(False),
        done=jnp.asarray(False),
    )

    def cond(s: GreedyState):
        return jnp.logical_and(~s.done, s.it <= max_iters)

    def run_estimator(q, ncols):
        if config.estimator == "gram":
            blocks, u = estimator_blocks(sys, q, ncols)
            rm = _reduced_from_u(sys, q, ncols, u)
            err, _ = estimate_errors(rm, blocks, config)
        else:
            u = operator_images(sys, q, ncols, shared=shared_raw)
            rm = _reduced_from_u(sys, q, ncols, u)
            err, _ = estimate_errors_direct(rm, u, sys.b, config)
        return err

    def body(s: GreedyState):
        # Seed phase: the first two body iterations take snapshots at the
        # domain endpoints without consulting the estimator (whose reduced
        # solve would be singular on an empty basis). Tracked by an
        # explicit counter, not by ncols: a linearly DEPENDENT second seed
        # (t-independent systems, symmetric sweeps) is skipped without
        # growing the basis, and the loop must still advance to the
        # estimator phase rather than re-taking the seed forever.
        seed_phase = s.seeded < 2
        err = lax.cond(
            seed_phase,
            lambda q, ncols: jnp.zeros((i,), rdtype),
            run_estimator,
            s.q,
            s.ncols,
        )
        # Under vmap (multi_geometry_greedy) the while_loop runs until the
        # SLOWEST lane converges and the body keeps executing for lanes
        # that are already done — every state update below is guarded by
        # s.done (and seed_phase) so a finished lane's result is
        # bit-identical to its serial run (frozen it/err_hist, no further
        # basis growth even for stagnated-not-converged lanes).
        frozen = jnp.logical_or(s.done, seed_phase)
        err_hist = s.err_hist.at[s.it].set(
            jnp.where(frozen, s.err_hist[s.it], err)
        )
        err_max = jnp.max(err)
        converged = jnp.where(
            frozen, s.converged, err_max < config.error_threshold
        )
        # Out of column budget → stop expanding even if not converged.
        out_of_budget = s.ncols + m > k
        # A NaN estimate can never converge; bail out instead of burning
        # the remaining budget on garbage snapshots.
        poisoned = jnp.logical_and(~seed_phase, jnp.isnan(err_max))
        t_seed = jnp.where(s.seeded == 0, sys.domain[0], sys.domain[-1])
        t_star = jnp.where(seed_phase, t_seed, sys.domain[jnp.argmax(err)])

        def solve_new(args):
            q, _ = args
            x_new = solve_point(
                sys, t_star, config, shared=shared_sym
            ).astype(q.dtype)
            # Stagnation guard (see MorfemConfig.dependency_tolerance):
            # does any new column retain norm after projecting out span(Q)?
            mask = column_mask(k, s.ncols, q.dtype)

            def project_out(v):
                # chunked f64 (not ozaki): the guard only needs ~8 digits
                # to decide independence, and each ozaki_apply instance
                # costs ~8 s of XLA compile inside this loop body
                coeff = precise_matmul_chunked(q.conj().T, v)
                return v - jnp.matmul(q, coeff * mask[:, None], precision=_HI)

            resid = project_out(project_out(x_new))
            ratio = jnp.linalg.norm(resid, axis=0) / jnp.maximum(
                jnp.linalg.norm(x_new, axis=0), 1e-300
            )
            independent = jnp.max(ratio) > config.dependency_tolerance
            return x_new, independent

        skip = jnp.logical_or(
            jnp.logical_or(converged, s.done),
            jnp.logical_or(out_of_budget, poisoned),
        )
        x_new, independent = lax.cond(
            skip,
            lambda args: (jnp.zeros((n, m), s.q.dtype), jnp.asarray(False)),
            solve_new,
            (s.q, s.ncols),
        )

        def expand(args):
            q, ncols = args
            if config.orthonormalization == "svd":
                # reference default path: stack + full thin SVD
                # (implementation.py:296-298)
                q2 = lax.dynamic_update_slice(q, x_new, (0, ncols))
                q2 = orthonormalize_svd_masked(q2, ncols + m)
                # count the columns the SVD actually produced: when the
                # snapshot is partially dependent (or the basis saturates
                # at ncols = N), trailing columns come back exactly zero —
                # counting them active makes the reduced system singular
                # (NaN sweeps). Orthonormal columns have unit norm, so a
                # 0.5 threshold on ‖column‖² is exact.
                colsq = jnp.sum(jnp.abs(q2) ** 2, axis=0)
                rank = jnp.sum((colsq > 0.5).astype(ncols.dtype))
                return q2, rank
            else:
                # reference USE_OPM path: Gram-Schmidt against the base
                # (implementation.py:275-295), done as CGS2
                return orthonormalize_append_cgs2(q, ncols, x_new)

        q2, ncols2 = lax.cond(
            independent, expand, lambda args: args, (s.q, s.ncols)
        )
        # A dependent snapshot ends the loop only in the REFINEMENT phase
        # (stagnation, see MorfemConfig.dependency_tolerance); a dependent
        # seed is simply skipped — the estimator phase starts regardless.
        stagnated = jnp.logical_and(~seed_phase, ~independent)
        done = jnp.logical_or(
            s.done,
            jnp.logical_or(
                jnp.logical_or(converged, out_of_budget),
                jnp.logical_or(poisoned, stagnated),
            ),
        )
        return GreedyState(
            q=q2,
            ncols=ncols2,
            seeded=jnp.where(
                jnp.logical_and(seed_phase, ~s.done), s.seeded + 1, s.seeded
            ),
            it=jnp.where(frozen, s.it, s.it + 1),
            err_hist=err_hist,
            converged=converged,
            done=done,
        )

    final = lax.while_loop(cond, body, init)
    return GreedyResult(
        q=final.q,
        ncols=final.ncols,
        iterations=final.it,
        converged=final.converged,
        err_hist=final.err_hist,
    )
