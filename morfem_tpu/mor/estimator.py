"""Algebraic residual-norm error estimator — the heart of the greedy loop.

Estimates ‖A(t)·Q·x_r(t) − b(t)‖_F for every domain point t without ever
forming the N-sized residual, by expanding the norm into 16 Gram blocks
that are independent of t (reference: implementation.py:348-452).

TPU-native redesign of the offline phase
----------------------------------------
The reference computes the nine N×N products A_iᴴ·A_j (plus the A_iᴴ·B /
Bᴴ·A_i / Bᴴ·B blocks) and then sandwiches each with Qᴴ·(·)·Q — an O(N³)
sparse-matrix-product bill per greedy iteration when USE_OPM is off
(implementation.py:370-402), which is exactly what the USE_OPM incremental
machinery exists to amortize (implementation.py:230-263, :279-293, :455-465).

Neither is the right shape for TPU. Observe

    Qᴴ·A_iᴴ·A_j·Q = (A_i·Q)ᴴ·(A_j·Q) = U_iᴴ·U_j,
    Qᴴ·A_iᴴ·B     = U_iᴴ·B,
    Bᴴ·A_j·Q      = Bᴴ·U_j = (U_jᴴ·B)ᴴ,

so the whole 16-block Gram structure follows from just three tall-skinny
products U_i = A_i·Q ([N,N]×[N,K] matmuls — MXU-shaped, a few GFLOP at
N≈3.4k) plus tiny [K,N]×[N,K] contractions. No N×N Gram matrix is ever
formed, and recomputing from scratch each iteration is cheaper than the
reference's *incremental* path — so the OPM bookkeeping (expand_matrix,
implementation.py:455-465) is obsolete by construction.

Online phase
------------
The reference loops over the I domain points in Python, with one small LU
solve and a 16-term quadratic form per point (implementation.py:414-441).
Here the I reduced solves run as one batched LU and the quadratic form as
three einsums over the whole batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.reduced import ReducedModel, assemble_reduced, solve_reduced_batch
from morfem_tpu.ops.orthonormalize import column_mask
from morfem_tpu.ops.precision import precise_gram, precise_matmul
from morfem_tpu.system import AffineSystem

# All f64 contractions here use HIGHEST precision explicitly: on TPU the
# default matmul precision degrades the emulated-f64 products to ~1e-7
# relative, which floors the estimator and silently stops greedy refinement.
_HI = jax.lax.Precision.HIGHEST


class EstimatorBlocks(NamedTuple):
    """Domain-independent Gram blocks of the residual-norm expansion.

    g[i, j]  = U_iᴴ·U_j            [3, 3, K, K]   (ref: qh_aih_aj_q ×9)
    gb[i]    = U_iᴴ·B              [3, K, M]      (ref: qh_aih_b ×3; the
                                                   bh_ai_q blocks are gb[i]ᴴ)
    bb       = Bᴴ·B                [M, M]         (ref: bh_b)
    """

    g: jax.Array
    gb: jax.Array
    bb: jax.Array


def operator_images(
    sys: AffineSystem, q: jax.Array, ncols: jax.Array, shared=None
) -> jax.Array:
    """U_p = A_p·Q for the masked padded basis — [3, N, K].

    The shared intermediate of both estimators and the projection: three
    [N,N]×[N,K] MXU matmuls. Inactive basis columns are exactly zero, so
    the corresponding U columns vanish and no further masking is needed.

    ``shared`` (optional `SharedAffineApply` over the RAW operators):
    reuse hoisted operand splits inside compiled loops (mor/greedy.py).
    """
    mask = column_mask(q.shape[1], ncols, q.dtype)
    qm = q * mask
    if shared is not None:
        return shared.apply_stack(qm)
    return jnp.stack([precise_matmul(a, qm) for a in sys.operators()])


def estimator_blocks(
    sys: AffineSystem, q: jax.Array, ncols: jax.Array
) -> Tuple[EstimatorBlocks, jax.Array]:
    """Compute the Gram blocks and (for reuse) the U_i = A_i·Q stack.

    ``q`` is the padded [N, K] basis with `ncols` active columns; inactive
    columns are exactly zero, so their Gram rows/columns vanish and no
    masking is needed downstream.

    Returns (blocks, u) with u shaped [3, N, K].
    """
    u = operator_images(sys, q, ncols)
    # Gram contractions run over the big N axis → chunked f64 matmuls
    g = jnp.stack(
        [
            jnp.stack([precise_gram(u[i].conj(), u[j]) for j in range(3)])
            for i in range(3)
        ]
    )
    gb = jnp.stack([precise_gram(u[i].conj(), sys.b) for i in range(3)])
    bb = precise_gram(sys.b.conj(), sys.b)
    return EstimatorBlocks(g=g, gb=gb, bb=bb), u


def estimate_errors(
    rm: ReducedModel,
    blocks: EstimatorBlocks,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> Tuple[jax.Array, jax.Array]:
    """Residual-norm estimate at every domain point.

    Faithful batched form of the reference's online loop
    (implementation.py:414-441): for each t solve the reduced system, then

      err(t) = ‖ Σ_{ij} c_i c_j · x_rᴴ G_ij x_r
               − Σ_i  c_i c_b · x_rᴴ gb_i
               − Σ_j  c_b c_j · gb_jᴴ x_r
               + c_b² · Bᴴ B ‖_F

    (coefficients enter as plain products, matching the reference even for
    complex-valued coefficient functions).

    Returns (err [I], x_r [I, K, M]).
    """
    c, cb = rm.coefficients(rm.domain)  # [I, 3], [I]
    a, rhs = assemble_reduced(rm, rm.domain, config)
    x = solve_reduced_batch(a, rhs, config)  # [I, K, M]

    # Balance the double coefficient products. TPU's emulated f64 keeps the
    # f32 exponent range (~3.4e38): for a 5 GHz sweep the pair product
    # c_2·c_2 = (f²)² ≈ 6e38 overflows even though every TERM
    # c_p·c_q·G_pq has a modest physical value (the Gram blocks carry the
    # inverse scale). Normalizing c by per-operator maxima and folding the
    # scales into G one factor at a time keeps all intermediates in range.
    s = jnp.maximum(jnp.max(jnp.abs(c), axis=0), 1e-300)  # [3]
    sb = jnp.maximum(jnp.max(jnp.abs(cb)), 1e-300)
    cn = c / s
    cbn = cb / sb
    g_bal = (blocks.g * s[:, None, None, None]) * s[None, :, None, None]
    gb_bal = (blocks.gb * s[:, None, None]) * sb
    bb_bal = blocks.bb * (sb * sb)

    # z[i] = Σ_{pq} c_p c_q G_pq  → [I, K, K]
    z = jnp.einsum("ip,iq,pqkl->ikl", cn, cn, g_bal, precision=_HI)
    t1 = jnp.einsum("ikm,ikl,iln->imn", x.conj(), z, x, precision=_HI)
    # gv[i] = Σ_p c_p c_b gb_p → [I, K, M]
    gv = jnp.einsum("ip,i,pkm->ikm", cn, cbn, gb_bal, precision=_HI)
    t2 = jnp.einsum("ikm,ikn->imn", x.conj(), gv, precision=_HI)
    # t3 = Σ_p c_b c_p gb_pᴴ x  (≡ t2ᴴ when coefficients are real)
    t3 = jnp.einsum("ip,i,pkm,ikn->imn", cn, cbn, gb_bal.conj(), x, precision=_HI)
    t4 = (cbn * cbn)[:, None, None] * bb_bal
    e = t1 - t2 - t3 + t4
    err = jnp.sqrt(jnp.sum(jnp.abs(e) ** 2, axis=(-1, -2)))
    return err, x


def estimate_errors_direct(
    rm: ReducedModel,
    u: jax.Array,
    b: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
    impl: str | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Residual-norm estimate per domain point, evaluated directly.

    Computes the same quantity as the Gram-block estimator —
    err(t) = ‖R(t)ᴴR(t)‖_F with R = Σ_p c_p·U_p·x_r − c_b·B and
    U_p = A_p·Q — but by forming the [N, M] residual itself instead of the
    reference's 16-term quadratic expansion (implementation.py:414-441).

    Why this is the TPU-native default: the quadratic expansion subtracts
    O(‖A‖²·‖x‖²) terms that cancel to O(err²), so its accuracy floor is
    ‖A‖²·ε — on TPU's emulated float64 (whose effective ε in large
    contractions is well above 1e-16) that floor can exceed the greedy
    threshold, silently stopping refinement early. The direct form
    subtracts once at the residual-vector level (A·Q·x_r ≈ b entrywise), so
    the floor is (ε·‖b‖)² per point. Cost: one [I, N, M]-shaped batched
    einsum per greedy iteration — trivial on the MXU and cheaper than the
    9 K²-sized Gram contractions it replaces.

    Args:
      rm: reduced model (padded).
      u: [P, N, K] stack U_p = A_p·Q (P = 3 + len(rm.r_extra)) from `estimator_blocks` / projection.
      b: [N, M] impulse part.
      impl: residual-product backend; None (default) reads
        ``config.estimator_impl``. "einsum" — emulated-f64 HIGHEST
        einsums (any dtype/backend). "ozaki" — ONE flat bf16 matmul over
        a per-call split of u plus an f32-true norm; f64-accurate where
        it matters (R's cancellation happens in the f64 recombination and
        subtraction; the post-normalization norm has no cancellation, so
        its 1e-7 f32 floor is noise at the estimator's job of argmax +
        threshold). "auto" picks einsum: an isolated-estimator compile
        probe favored ozaki (17.3 s vs 42 s), but at whole-greedy level
        XLA shares the einsum expansion with the refinement path and the
        ordering flips — full cold compile measured on the v5e at
        N=3411: einsum 64.0 s vs ozaki 79.3 s (round 3 A/B; both after
        the elementwise 3-term weighted sum below cut the einsum build
        from 86 s). "ozaki" stays available for workloads that never
        touch the emulated-f64 matmul elsewhere.

    Returns:
      (err [I], x_r [I, K, M]).
    """
    if impl is None:
        impl = config.estimator_impl
    if impl not in ("auto", "einsum", "ozaki"):
        raise ValueError(f"impl must be auto|einsum|ozaki, got {impl!r}")
    c, cb = rm.coefficients(rm.domain)  # [I, 3], [I]
    a, rhs = assemble_reduced(rm, rm.domain, config)
    x = solve_reduced_batch(a, rhs, config)  # [I, K, M]

    real_f64 = (
        u.dtype == jnp.dtype(jnp.float64)
        and x.dtype == jnp.dtype(jnp.float64)
        and b.dtype == jnp.dtype(jnp.float64)
    )
    # auto == einsum today: the whole-greedy compile A/B (see docstring)
    # went to einsum, and runtimes are within noise of each other
    use_ozaki = impl == "ozaki"
    if use_ozaki and not real_f64:
        raise ValueError("impl='ozaki' needs real float64 operands")
    prep = None
    if use_ozaki:
        from morfem_tpu.ops.precision import ozaki_prepare

        # split u ONCE, outside the chunk loop: every chunk's residual is
        # then one flat bf16 matmul against the same slices
        prep = ozaki_prepare(u)

    i_pts = c.shape[0]
    chunk = max(1, min(config.estimator_chunk, i_pts))
    pad = (-i_pts) % chunk

    def pad0(arr):
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths)

    n_add = c.shape[-1]  # addend count P (3 classic; 6 complex-coeff)
    c_ch = pad0(c).reshape((-1, chunk, n_add))
    cb_ch = pad0(cb).reshape((-1, chunk))
    x_ch = pad0(x).reshape((-1, chunk) + x.shape[1:])

    def chunk_err(args):
        cc, cbc, xc = args
        # R = Σ_p c_p·(U_p @ x) − c_b·B   → [chunk, N, M]
        if use_ozaki:
            from morfem_tpu.ops.precision import ozaki_apply

            ch, k_b, m_rhs = xc.shape
            xf = jnp.moveaxis(xc, 0, 1).reshape(k_b, ch * m_rhs)
            ys = ozaki_apply(prep, xf)  # [P, N, chunk·M] f64-true
            ux = jnp.moveaxis(
                ys.reshape(n_add, u.shape[1], ch, m_rhs), 2, 1
            )  # [P, chunk, N, M]
            r = (
                sum(cc[:, p, None, None] * ux[p] for p in range(n_add))
                - cbc[:, None, None] * b
            )
        else:
            # fold the operator axis into the contraction: concatenate
            # U_p along K and scale x by c_p per point, so the whole
            # 3-term sum is ONE [N,3K]×[3K,M] product. Against the
            # p-batched einsum + elementwise weighted sum this compiles
            # 5.5× cheaper on the TPU backend (2.4 s vs 13.2 s isolated;
            # the emulated-f64 HIGHEST expansion is per-dot-instance) at
            # identical results to 3e-14 and equal runtime (round-3
            # isolated probe; whole-greedy A/B below confirms).
            ch = xc.shape[0]
            n_rows, k_b = u.shape[1], u.shape[2]
            ucat = jnp.moveaxis(u, 0, 1).reshape(n_rows, n_add * k_b)
            xcat = (cc[:, :, None, None] * xc[:, None]).reshape(
                ch, n_add * k_b, xc.shape[-1]
            )
            r = (
                jnp.einsum("nk,ikm->inm", ucat, xcat, precision=_HI)
                - cbc[:, None, None] * b
            )
        # err = ‖RᴴR‖_F (reference norm semantics, implementation.py:424),
        # computed SCALE-INVARIANTLY: TPU's emulated f64 is a double-f32
        # pair whose multiply squares the hi word — any factor beyond
        # ~1.8e19 overflows f32's range and returns NaN (inf − inf in the
        # renormalization). ‖RᴴR‖_F is quartic in R, so physical scales
        # like ‖b‖ ~ f ≈ 4e9 cross that cliff at the very first greedy
        # iteration (observed on a v5e: 98/100 points NaN, greedy
        # poison-bailed after the seeds). Normalize R per point first;
        # the final s²·‖·‖ product stays far below the f32 range.
        # dtype-aware floor: a literal like 1e-300 underflows to 0 in f32,
        # making an exactly-zero residual produce 0/0 = NaN instead of err=0
        s = jnp.maximum(
            jnp.max(jnp.abs(r), axis=(-1, -2), keepdims=True),
            jnp.asarray(jnp.finfo(r.real.dtype).tiny, r.real.dtype),
        )
        rn = r / s
        if use_ozaki:
            # post-normalization there is NO cancellation left (max
            # element of rn is exactly ±1, the Gram diag is O(1)), so an
            # f32-true product is 1e-7-relative on ν — noise against the
            # estimator's argmax/threshold job, and free of the emulated-
            # f64 einsum's compile/runtime cost
            from morfem_tpu.ops.precision import matmul_f32_accurate

            rn32 = rn.astype(jnp.float32)
            rhr = matmul_f32_accurate(jnp.swapaxes(rn32, -1, -2), rn32)
            norm_n = jnp.sqrt(
                jnp.sum(jnp.square(rhr), axis=(-1, -2))
            ).astype(r.real.dtype)
        else:
            rhr = jnp.einsum("inm,inl->iml", rn.conj(), rn, precision=_HI)
            norm_n = jnp.sqrt(jnp.sum(jnp.abs(rhr) ** 2, axis=(-1, -2)))
        # (s·√ν)² rather than s²·ν: every multiply's factors stay ≤ √(f32
        # max), so the result is safe over emulated-f64's whole range
        return jnp.square(s[:, 0, 0].real * jnp.sqrt(norm_n))

    if c_ch.shape[0] == 1:
        # common case (I ≤ estimator_chunk): keep the loop construct out
        # of the graph — one less while-loop for XLA to schedule inside
        # the greedy's compiled body
        err = chunk_err((c_ch[0], cb_ch[0], x_ch[0]))[None]
    else:
        err = jax.lax.map(chunk_err, (c_ch, cb_ch, x_ch))
    err = err.reshape(-1)[:i_pts]
    return err, x


def residual_norm_exact(
    sys: AffineSystem,
    rm: ReducedModel,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> jax.Array:
    """Exact residual norm ‖A(t)·Q·x_r(t) − b(t)‖_F per domain point.

    Counterpart of the reference's (dead-code) ``residual_norm``
    (implementation.py:331-345). Kept as the test oracle for the algebraic
    estimator: both must agree to working precision.
    """
    from morfem_tpu.ops.assembly import assemble_at
    from morfem_tpu.mor.reduced import sweep

    x = sweep(rm, config)  # [I, K, M]
    a, b = assemble_at(sys, rm.domain, symmetrize=config.symmetrize)

    # NOTE: the reference's estimator expands the residual with the RAW
    # (unsymmetrized) operators while its solutions use the symmetrized
    # system matrix (implementation.py:370-385 vs :526-528). For symmetric
    # inputs (the FEM case) both agree; this oracle uses the raw operators
    # to match the estimator's definition.
    c, cb = sys.coefficients(rm.domain)
    a_raw = (
        c[..., 0, None, None] * sys.a0
        + c[..., 1, None, None] * sys.a1
        + c[..., 2, None, None] * sys.a2
    )
    qx = jnp.einsum("nk,ikm->inm", rm.q, x, precision=_HI)
    res = jnp.einsum(
        "inl,ilm->inm", a_raw, qx, precision=_HI
    ) - cb[:, None, None] * sys.b
    return jnp.sqrt(jnp.sum(jnp.abs(res) ** 2, axis=(-1, -2)))
