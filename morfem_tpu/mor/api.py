"""Public API: ``morfem()`` and the builder it wraps.

Same call contract as the reference's entry point
(implementation.py:99-186):

    morfem(domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b)
        -> (x, q, a0_r, a1_r, a2_r, b_r)

with the same defaults (t_a0 = 1, t_a1 = t, t_a2 = t², t_b = t — the wave
equation form) and the same shape contract: x [I, Nr, M], q [N, Nr],
a*_r [Nr, Nr], b_r [Nr, M]. Also supports the documented equivalent-call
forms (docs/source/index.rst:52-62): any coefficient may be overridden by a
keyword, and operators may be zero matrices.

Differences (intentional, TPU-first):

  * No global flags — behaviour is configured via an explicit
    `MorfemConfig` argument.
  * The reference mutates its ModelDefinition in place
    (implementation.py:179: ``md_r = md``); here nothing is mutated.
  * The pipeline up to the padded reduced model is a single compiled
    program. The variable basis size Nr is materialized exactly once at
    the end (one device→host sync to trim the padding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.equally import equally_distributed_basis
from morfem_tpu.mor.greedy import greedy_basis, GreedyResult
from morfem_tpu.mor.reduced import ReducedModel, project, sweep
from morfem_tpu.system import (
    AffineSystem,
    _default_t_a0,
    _default_t_a1,
    _default_t_a2,
    _default_t_b,
)
from morfem_tpu.utils.timing import PhaseTimer


_warned_x64 = False


def _warn_if_x64_disabled(b) -> None:
    """Warn ONCE when f64 inputs meet a disabled jax x64 mode.

    The reference works in NumPy float64 throughout; this package's
    accuracy contract (adaptive f64 refinement, ~1e-10 solution error)
    assumes ``jax.config.update("jax_enable_x64", True)``. Without it JAX
    silently casts every input to f32 and the refinement floors at ~5e-8
    — measured round 3 via a drive script that forgot the flag. A silent
    250× accuracy regression is a trap; say something.
    """
    global _warned_x64
    if _warned_x64 or jax.config.jax_enable_x64:
        return
    try:
        import numpy as np

        dt = np.asarray(getattr(b, "data", b)).dtype
        if dt not in (np.float64, np.complex128):
            return
    except Exception:
        return
    _warned_x64 = True
    import warnings

    warnings.warn(
        "morfem(): float64 inputs but jax x64 mode is DISABLED — all "
        "arithmetic will silently run in float32 and solution accuracy "
        "floors at ~5e-8 instead of ~1e-10. Call "
        'jax.config.update("jax_enable_x64", True) before importing '
        "arrays (see README).",
        stacklevel=3,
    )


def _warn_if_unconverged(result: GreedyResult) -> None:
    """Warn when the greedy loop stopped short of its error threshold.

    The reference's greedy iterates until the estimator clears the
    threshold no matter what (implementation.py:269); this package caps
    at ``max_greedy_iterations`` and returns ``converged=False`` instead
    of looping forever. That deviation is documented, but ``morfem()``
    callers never see the flag — without a warning an unconverged basis
    ships silently, a parity-of-surprise gap vs the reference. The flag
    is already on the host by the time this runs (the basis was just
    block_until_ready'd), so the check costs one scalar readback.
    """
    if bool(result.converged):
        return
    import warnings

    if bool(result.failed_snapshot):
        warnings.warn(
            "morfem(): greedy basis construction ABORTED after "
            f"{int(result.iterations)} estimator evaluations because a "
            "seed/snapshot solve did not reach an acceptable residual "
            "(see the preceding snapshot-solver warnings for the failing "
            "point and residual). The returned reduced model is the best "
            "basis found; raising config.max_greedy_iterations will NOT "
            "help — improve the snapshot solver instead (e.g. "
            "config.band_max_half, Krylov settings, or conditioning of "
            "the system near the failing point).",
            stacklevel=3,
        )
        return
    warnings.warn(
        "morfem(): greedy basis construction stopped after "
        f"{int(result.iterations)} estimator evaluations WITHOUT reaching "
        "the error threshold (column budget exhausted, or refinement "
        "stagnated). The returned reduced model is the best basis found; "
        "raise config.max_greedy_iterations or relax "
        "config.error_threshold to converge.",
        stacklevel=3,
    )


def build_reduced_model(
    sys: AffineSystem,
    config: MorfemConfig = DEFAULT_CONFIG,
    timer: Optional[PhaseTimer] = None,
) -> Tuple[ReducedModel, Optional[GreedyResult]]:
    """Build the projection basis and project the system.

    Counterpart of `projection_base` / `projection_base_equally_distributed`
    selection (implementation.py:175) plus the projection step
    (implementation.py:179-184). Returns the padded ReducedModel and, for
    the greedy strategy, the GreedyResult with the error history
    (the reference's `error_in_iteration`, implementation.py:265-271).
    """
    timer = timer or PhaseTimer(disabled=True)
    greedy_result = None
    with timer.phase("projection base"):
        if config.use_equally_distributed:
            q = equally_distributed_basis(sys, config)
            ncols = jnp.asarray(q.shape[1])
        else:
            greedy_result = greedy_basis(sys, config)
            q, ncols = greedy_result.q, greedy_result.ncols
        jax.block_until_ready(q)
    if greedy_result is not None:
        _warn_if_unconverged(greedy_result)
    with timer.phase("projection"):
        rm = project(sys, q, ncols)
        jax.block_until_ready(rm.b_r)
    return rm, greedy_result


def morfem(
    domain,
    a0,
    a1,
    a2,
    b,
    t_a0=_default_t_a0,
    t_a1=_default_t_a1,
    t_a2=_default_t_a2,
    t_b=_default_t_b,
    config: MorfemConfig = DEFAULT_CONFIG,
    timer: Optional[PhaseTimer] = None,
):
    """Solve the parametric problem via model order reduction.

    | Solves (t_a0·a0 + t_a1·a1 + t_a2·a2)·x = t_b·b over the whole domain
    | by Galerkin projection onto a snapshot basis, exactly like the
    | reference `morfem` (implementation.py:99-186).

    Args:
      domain: [I] ordered parameter grid.
      a0, a1, a2: [N, N] system-matrix addends (numpy, jnp, SciPy sparse or
        BCOO). SciPy-sparse inputs with N > config.dense_cutoff stay
        MATRIX-FREE end to end (RCM-banded direct snapshot solves, or
        BCOO+Krylov when the sparsity is not band-recoverable) — the
        reference's always-sparse splu behaviour; smaller systems are
        densified for the batched MXU pipeline. COMPLEX sparse operators
        AND complex coefficient callables ride the interleaved real 2N
        embedding automatically (symmetrize=False required; complex
        coefficients split into Re/Im operator addends, a complex t_b
        folds in as |t_b| during the build — see
        `_morfem_matfree_complex`). Complex routes return the full
        COMPLEX reduced model: q [N, Nr] complex-orthonormal,
        a*_r = qᵀ·a*·q, b_r = qᵀ·b and x solving the reduced systems —
        self-consistent and re-sweepable on any grid
        (`sweep_complex_reduced`); einsum("nk,ikm->inm", q, x) gives
        the complex solutions.
      b: [N, M] impulse-vector part.
      t_a0, t_a1, t_a2, t_b: JAX-traceable coefficient callables; defaults
        1, t, t², t.
      config: MorfemConfig (strategy, threshold, precision, …).
      timer: optional PhaseTimer for a phase breakdown.

    Returns:
      (x, q, a0_r, a1_r, a2_r, b_r) — x [I, Nr, M] reduced solutions,
      q [N, Nr] basis, a*_r [Nr, Nr], b_r [Nr, M]. Padding is trimmed.
    """
    timer = timer or PhaseTimer(disabled=True)
    _warn_if_x64_disabled(b)
    try:
        import scipy.sparse as _sp

        sp_is = _sp.issparse
    except Exception:  # pragma: no cover - scipy is a hard dep in practice
        sp_is = lambda _x: False  # noqa: E731
    try:
        sparse_input = any(sp_is(x) for x in (a0, a1, a2))
        n_in = a0.shape[0]
    except Exception:
        sparse_input = False
        n_in = 0
    if sparse_input and n_in > config.dense_cutoff:
        # the reference stays sparse throughout (splu,
        # implementation.py:474-476); beyond dense_cutoff so do we —
        # RCM-banded direct solves, or BCOO+Krylov as fallback
        import numpy as np

        complex_input = any(
            np.iscomplexobj(getattr(m, "data", m)) for m in (a0, a1, a2)
        ) or np.iscomplexobj(getattr(b, "data", b))
        from morfem_tpu.ops.complex_split import eval_coefficient_table

        tables = [
            eval_coefficient_table(domain, fn)
            for fn in (t_a0, t_a1, t_a2, t_b)
        ]
        coeffs_complex = any(
            np.iscomplexobj(t) and np.any(t.imag != 0) for t in tables
        )
        if complex_input or coeffs_complex:
            return _morfem_matfree_complex(
                domain, a0, a1, a2, b, tables, config, timer,
                fns=(t_a0, t_a1, t_a2, t_b),
            )
        return _morfem_matfree(
            domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config, timer
        )
    import numpy as np

    dense_complex = any(
        np.iscomplexobj(m.data if sp_is(m) else np.asarray(m))
        for m in (a0, a1, a2, b)
    )
    if jax.default_backend() == "tpu":
        from morfem_tpu.ops.complex_split import eval_coefficient_table

        coeff_tables = [
            eval_coefficient_table(domain, fn)
            for fn in (t_a0, t_a1, t_a2, t_b)
        ]
        dense_coeffs_complex = any(
            np.iscomplexobj(t) and np.any(t.imag != 0)
            for t in coeff_tables
        )
        if dense_coeffs_complex:
            # complex COEFFICIENTS with dense/small operators: the 2N
            # embedding requires real coefficients (it only commutes
            # with real combinations), and the interleaved P-generic
            # machinery is a sparse pipeline. The dense pipeline itself
            # is dtype-generic — so run it on the CPU backend, where
            # complex128 is native (exactly the reference's own
            # arithmetic, implementation.py:468-480). N ≤ dense_cutoff
            # here, well within host LU reach.
            return _morfem_dense_on_cpu(
                domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config,
                timer,
            )
        if dense_complex:
            # complex128 does not exist on TPU (even the transfer hangs
            # the backend); run the pipeline on the real 2N embedding —
            # the splu/lu_factor dtype-genericity the reference gets for
            # free (implementation.py:468-480).
            return _morfem_embedded_dense(
                domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config,
                timer,
            )
    sys = AffineSystem.create(domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b)
    rm, _ = build_reduced_model(sys, config, timer)
    rm = rm.trim()
    with timer.phase("reduced sweep"):
        x = _run_sweep(rm, config)
        jax.block_until_ready(x)
    return x, rm.q, rm.r0, rm.r1, rm.r2, rm.b_r


def _morfem_dense_on_cpu(
    domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config, timer
):
    """Dense `morfem()` pinned to the CPU backend (complex128 native).

    The corner this serves: TPU sessions with DENSE/small operators and
    complex-valued coefficient callables. The 2N embedding cannot carry
    complex coefficients (it commutes with REAL combinations only,
    ops/complex_split.py), and the interleaved Re/Im-addend machinery is
    a sparse pipeline — but the dense pipeline is already dtype-generic,
    so the correct and simple route is to run it where complex128
    exists. N ≤ config.dense_cutoff here, well within host LU reach;
    the returned tuple is the native complex reduced model (already
    self-consistent — no finishing step needed).
    """
    import numpy as np

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sys = AffineSystem.create(
            np.asarray(domain),
            *(np.asarray(m.todense()) if hasattr(m, "todense")
              else np.asarray(m) for m in (a0, a1, a2, b)),
            t_a0, t_a1, t_a2, t_b,
        )
        rm, _ = build_reduced_model(sys, config, timer)
        rm = rm.trim()
        with timer.phase("reduced sweep"):
            x = _run_sweep(rm, config)
            jax.block_until_ready(x)
        return x, rm.q, rm.r0, rm.r1, rm.r2, rm.b_r


def _morfem_embedded_dense(
    domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config, timer
):
    """Complex dense `morfem()` on the real 2N embedding (TPU path).

    The embedding builds the basis (symmetrize must be off, enforced in
    ops/complex_split.py); the RETURN is the reference-contract complex
    reduced model — q [N, Nr] complex-orthonormal, r_i = qᵀ·a_i·q over
    the ORIGINAL complex operators, x re-solved from those Nr×Nr
    matrices on the host (`mor/complex_model.py`), so the tuple is
    self-consistent and re-sweeps any grid (implementation.py:186).
    """
    import numpy as np

    from morfem_tpu.mor.complex_model import finish_complex_model
    from morfem_tpu.ops.complex_split import embed_affine_system

    sys_e = embed_affine_system(
        domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config=config
    )
    rm, _ = build_reduced_model(sys_e, config, timer)
    rm = rm.trim()
    n = a0.shape[0]
    q_e = np.asarray(rm.q)
    q_c = q_e[:n] + 1j * q_e[n:]
    with timer.phase("complex reduced model"):
        return finish_complex_model(
            np.asarray(q_c), np.asarray(a0), np.asarray(a1),
            np.asarray(a2), b, domain, t_a0, t_a1, t_a2, t_b,
        )


def _morfem_matfree_complex(
    domain, a0, a1, a2, b, tables, config, timer, fns
):
    """Complex `morfem()` — complex operators AND/OR complex coefficient
    callables — on the interleaved real 2N embedding, matrix-free.

    `splu` is fully dtype-generic (implementation.py:468-480); the
    TPU-native equivalent, by part:

    * complex OPERATORS embed as interleaved real 2×2 rotation blocks —
      band structure preserved (`embed_sparse_interleaved`);
    * complex operator COEFFICIENTS split into two real terms each,
      E(c·A) = Re(c)·E(A) + Im(c)·E(i·A), carried as extra operator
      addends through the P-generic matrix-free pipeline
      (greedy_basis_matfree t_extra / ReducedModel.r_extra);
    * a complex t_b folds EXACTLY into the real pipeline: solve with the
      real coefficient |t_b(t)| and multiply the reduced solutions by the
      unit phase t_b/|t_b| per point afterwards (A·x = c·b ⇔ x = phase·y
      with A·y = |c|·b) — the estimator's residual weighting |t_b| is
      untouched, so greedy point selection is identical to the complex
      problem's.

    ``tables`` are the coefficient callables pre-evaluated over the
    domain grid on the host (`eval_coefficient_table`) — complex128
    cannot be traced on TPU, so the BUILD carries exact grid-lookup
    callables instead. The RETURN is grid-generic regardless: the
    embedded basis is finished into a self-consistent complex Nr×Nr
    reduced model (`mor/complex_model.py::finish_complex_model`) whose
    matrices project the ORIGINAL complex operators, so any grid can be
    re-swept from it with the caller's own callables
    (`sweep_complex_reduced`) — the reference's return-tuple genericity
    (implementation.py:186, :468-480).

    Returns (x, q, r0, r1, r2, b_r) — ALL complex and self-consistent:
    q [N, Nr] complex-orthonormal, r_i = qᵀ·a_i·q, b_r = qᵀ·b, and x
    solves (Σ t_ai·r_i)·x = t_b·b_r per point;
    ``einsum("nk,ikm->inm", q, x)`` gives the complex solutions.
    """
    import numpy as np

    from morfem_tpu.mor.complex_model import finish_complex_model
    from morfem_tpu.ops.complex_split import (
        embed_rhs_interleaved,
        embed_sparse_interleaved,
        grid_lookup_coefficient,
    )

    if config.symmetrize:
        raise ValueError(
            "complex sparse systems: the real embedding is "
            "non-symmetric; run with config.symmetrize=False "
            "(the (A+Aᵀ)/2 step would change the problem)"
        )
    ca, cb = tables[:3], tables[3]
    mats = [embed_sparse_interleaved(m) for m in (a0, a1, a2)]
    lk_fns = [grid_lookup_coefficient(domain, np.real(t)) for t in ca]
    extra = []
    for m, t in zip((a0, a1, a2), ca):
        if np.iscomplexobj(t) and np.any(t.imag != 0):
            extra.append((
                embed_sparse_interleaved(1j * m),
                grid_lookup_coefficient(domain, np.imag(t)),
            ))
    cb_complex = np.iscomplexobj(cb) and np.any(cb.imag != 0)
    if cb_complex:
        # the BUILD solves with |t_b| (phase-invariant residuals, see the
        # docstring); the returned x comes from the complex reduced model
        # below, so no per-point phase fold is needed on the way out
        tb_fn = grid_lookup_coefficient(domain, np.abs(cb))
    else:
        tb_fn = grid_lookup_coefficient(domain, np.real(cb))
    be = embed_rhs_interleaved(b)
    _, q_e, *_ = _morfem_matfree(
        domain, mats[0], mats[1], mats[2], be,
        lk_fns[0], lk_fns[1], lk_fns[2], tb_fn, config, timer,
        extra_terms=tuple(extra),
    )
    from morfem_tpu.ops.complex_split import deinterleave

    q_c = deinterleave(np.asarray(q_e))
    with timer.phase("complex reduced model"):
        return finish_complex_model(
            q_c, a0, a1, a2, b, domain, fns[0], fns[1], fns[2], fns[3]
        )


def _morfem_matfree(
    domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b, config, timer,
    extra_terms=(),
):
    """Matrix-free `morfem()` for large sparse systems (same contract).

    Operator selection: RCM-reordered banded direct solves when the
    sparsity is band-recoverable (ops/block_tridiag.py — handles
    indefinite in-band pencils), else BCOO + Jacobi-Krylov
    (definite/diagonally-dominant systems; achieved residuals are
    checked and warned about). The returned q is in the CALLER'S row
    ordering regardless of the internal permutation.

    ``extra_terms``: optional ((matrix, coefficient_callable), …) operator
    addends BEYOND the classic 3-term pencil — the complex-coefficient
    route feeds the Im-part embeddings through here (P-generic operators
    and estimator downstream).
    """
    import numpy as np
    import scipy.sparse as sp

    from morfem_tpu.mor.equally import seed_indices
    from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
    from morfem_tpu.ops.block_tridiag import (
        BandwidthError,
        banded_via_rcm,
        truncated_band_via_rcm,
    )
    from morfem_tpu.ops.sparse import (
        GeneralSparseOperator,
        sparse_project,
        sparse_snapshot_basis,
    )

    domain = jnp.asarray(domain)
    b = jnp.asarray(
        b.toarray() if sp.issparse(b) else np.asarray(b)
    )
    if b.ndim == 1:
        b = b[:, None]
    n = b.shape[0]
    extra_mats = [m for m, _ in extra_terms]
    t_extra = tuple(fn for _, fn in extra_terms)
    mats = [
        m if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
        for m in (a0, a1, a2, *extra_mats)
    ]
    perm = None
    with timer.phase("operator setup"):
        try:
            op, perm = banded_via_rcm(
                *mats, symmetrize=config.symmetrize,
                max_half=config.band_max_half,
            )
            b_op = b[perm]
        except BandwidthError:
            # non-band-recoverable sparsity: exact BCOO applies with the
            # truncated-band shifted-direct preconditioner (robust on
            # indefinite systems, unlike the old Jacobi-Krylov demotion);
            # only the bandwidth rejection lands here — unrelated
            # ValueErrors (malformed inputs) propagate
            exact_op, band_op, perm, dropped = truncated_band_via_rcm(
                *mats, symmetrize=config.symmetrize,
                band_half=config.band_max_half,
            )
            op = GeneralSparseOperator(exact_op, band_op, dropped=dropped)
            b_op = b[perm]
    coeffs = (t_a0, t_a1, t_a2, *t_extra, t_b)
    with timer.phase("projection base"):
        if config.use_equally_distributed:
            idx = seed_indices(int(domain.shape[0]), config)
            q_op = sparse_snapshot_basis(
                mats, b_op, domain, jnp.asarray(idx), coeffs,
                config=config, op=op,
            )
            if perm is not None:
                pmats = [m.tocsr()[np.asarray(perm)][:, np.asarray(perm)]
                         for m in mats]
            else:
                pmats = mats
            (r0, r1, r2, *r_extra), b_r = sparse_project(
                pmats, b_op, q_op
            )
            rm = ReducedModel(
                domain=domain, q=q_op, r0=r0, r1=r1, r2=r2, b_r=b_r,
                ncols=jnp.asarray(q_op.shape[1]),
                t_a0=t_a0, t_a1=t_a1, t_a2=t_a2, t_b=t_b,
                r_extra=tuple(r_extra), t_extra=t_extra,
            )
        else:
            gres, rm = greedy_basis_matfree(
                op, b_op, domain, t_a0, t_a1, t_a2, t_b, config=config,
                t_extra=t_extra,
            )
            _warn_if_unconverged(gres)
            q_op = rm.q
    rm = rm.trim()
    q_out = rm.q
    if perm is not None:
        q_out = jnp.zeros_like(rm.q).at[perm].set(rm.q)
    with timer.phase("reduced sweep"):
        x = _run_sweep(rm, config)
        jax.block_until_ready(x)
    return x, q_out, rm.r0, rm.r1, rm.r2, rm.b_r


def _run_sweep(rm: ReducedModel, config: MorfemConfig):
    """Final sweep dispatch per `config.sweep_method`.

    "auto": two-term diagonalization → quadratic (companion) diagonalization
    → batched LU, first applicable wins. Each spectral variant costs one
    small host-side factorization and sweeps in O(K·M) per point.
    """
    if config.sweep_method == "lu":
        return sweep(rm, config)
    from morfem_tpu.mor.spectral import (
        prepare_spectral,
        prepare_spectral_quadratic,
        spectral_sweep,
        spectral_sweep_quadratic,
    )

    try:
        return spectral_sweep(prepare_spectral(rm, config))
    except ValueError:
        if config.sweep_method == "spectral":
            raise
    try:
        return spectral_sweep_quadratic(
            prepare_spectral_quadratic(rm, config)
        )
    except ValueError:
        return sweep(rm, config)
