"""Accurate f64 matmuls on TPU: Ozaki-scheme MXU passes + chunked fallback.

TPU's emulated float64 matmul silently loses precision once the
CONTRACTION dimension exceeds ~2.5k: measured on a v5e, QᵀQ with a 2048-
long contraction is accurate to 2.5e-15 but jumps to 1.1e-7 at 3072 and
degrades further with size — independent of the `precision=` argument
(the double-float emulation apparently drops its compensation term in the
large-K kernel). That single behavior capped the whole MOR pipeline at
~3e-7 at the reference's N = 3411: snapshot refinement, Gram projections
and basis orthonormality all floor there.

`precise_matmul` restores full f64 accuracy two ways:

* TPU real-f64 (the hot path): `ozaki_matmul` — the operands are split
  into integer-valued bf16 slices whose MXU passes accumulate EXACTLY in
  f32, recombined in f64. Exact for any contraction width (no large-K
  cliff) and faster than the emulated-f64 matmul, especially with a
  pre-split LHS inside refinement loops (`ozaki_prepare`/`ozaki_apply`).
* elsewhere (CPU, complex128, small K): HIGHEST-precision matmul with
  the contraction chunked into ≤2048-wide pieces summed in f64
  (measured 2.2e-15 at an 8192-long contraction).

Narrow dtypes (f32/bf16 compute) pass straight through — both concerns
are f64/c128-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST

# measured safe contraction width for TPU's emulated f64 matmul
F64_SAFE_CONTRACTION = 2048

# contraction width at which the TPU real-f64 path switches to the Ozaki
# matmul; raise to a huge value to force the chunked emulated-f64 path
# (debugging knob)
OZAKI_MIN_K = 256


def _needs_chunking(a: jax.Array, b: jax.Array) -> bool:
    wide = jnp.result_type(a.dtype, b.dtype) in (
        jnp.dtype(jnp.float64),
        jnp.dtype(jnp.complex128),
    )
    return wide and a.shape[-1] > F64_SAFE_CONTRACTION + 512


def precise_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """matmul(a, b) with f64-true results on every backend.

    a: [..., m, k], b: [..., k, n] (standard matmul broadcasting).
    Dispatch:

    - CPU / narrow dtypes: native matmul at HIGHEST precision.
    - TPU real-f64 with k ≥ 256: `ozaki_matmul` — exact bf16-slice MXU
      passes, ~50× the emulated-f64 path and no large-K accuracy loss.
    - TPU complex128 / small-k f64: XLA's emulated f64 at HIGHEST, with
      the contraction chunked to ≤2048 where needed (the emulation loses
      8 digits beyond ~2.5k contraction otherwise).
    """
    wide = jnp.result_type(a.dtype, b.dtype) in (
        jnp.dtype(jnp.float64),
        jnp.dtype(jnp.complex128),
    )
    real_f64 = wide and not (
        jnp.issubdtype(a.dtype, jnp.complexfloating)
        or jnp.issubdtype(b.dtype, jnp.complexfloating)
    )
    k = a.shape[-1]
    if (
        real_f64
        and OZAKI_MIN_K <= k <= (1 << 20)  # ozaki_params needs K·4^β ≤ 2²⁴
        # Ozaki is the workaround for TPU's emulated f64; backends with
        # native f64 matmul (CPU, GPU) are faster AND more accurate direct
        and jax.default_backend() == "tpu"
    ):
        vector_rhs = b.ndim == 1
        out = ozaki_matmul(
            a.astype(jnp.float64),
            b.astype(jnp.float64)[:, None] if vector_rhs else b.astype(jnp.float64),
        )
        return out[..., 0] if vector_rhs else out
    return precise_matmul_chunked(a, b)


def precise_matmul_chunked(a: jax.Array, b: jax.Array) -> jax.Array:
    """The chunked emulated-f64 path, callable directly.

    ~8 digits at any contraction width (2.2e-15 measured at K=8192) but
    slower than the Ozaki path at large K. Direct use is a TRACE-SIZE
    escape hatch: one chunked product is 2 HLO matmuls (~1.4 s XLA
    compile) vs an `ozaki_apply` instance (~8 s) — the right trade for
    narrow, accuracy-tolerant products inside compiled loops (the
    greedy's stagnation guard)."""
    k = a.shape[-1]
    if not _needs_chunking(a, b):
        return jnp.matmul(a, b, precision=HIGHEST)
    vector_rhs = b.ndim == 1
    if vector_rhs:
        b = b[:, None]
    c = F64_SAFE_CONTRACTION
    out = None
    for start in range(0, k, c):
        stop = min(start + c, k)
        part = jnp.matmul(
            a[..., start:stop], b[..., start:stop, :], precision=HIGHEST
        )
        out = part if out is None else out + part
    return out[..., 0] if vector_rhs else out


def split_bf16(x: jax.Array, pieces: int = 3) -> list:
    """Represent an f32 array as a sum of `pieces` bf16 words.

    bf16 carries 8 mantissa bits; three words cover f32's 24. The split is
    exact in f32 arithmetic (each residual subtraction is representable).
    """
    parts = []
    r = x.astype(jnp.float32)
    for _ in range(pieces):
        # Round to bf16 with lax.reduce_precision, NOT astype: the axon AOT
        # path compiles with --xla_allow_excess_precision=true, which lets
        # XLA elide f32→bf16→f32 cast chains in some fusion contexts —
        # silently zeroing the residual pieces (observed: the blocked-GJ
        # factorization collapsing to 1-pass bf16 accuracy under fori_loop).
        # reduce_precision is contractually exact rounding; the astype to
        # bf16 afterwards is then value-preserving and safe to elide.
        h32 = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        parts.append(h32.astype(jnp.bfloat16))
        r = r - h32
    return parts


def matmul_f32_accurate(a: jax.Array, b: jax.Array, pieces: int = 3) -> jax.Array:
    """f32-TRUE matmul on TPU via multi-word bf16 MXU passes.

    On this platform a plain f32 `jnp.matmul` runs the MXU in single-pass
    bf16 (measured rel err 2.4e-3), `Precision.HIGH` is a 3-pass scheme
    (1.3e-5), and `Precision.HIGHEST` falls off a software cliff
    (~0.01 TFLOP/s — 2000× slower than bf16). The right TPU-native tool is
    an explicit bf16 Dekker-style split: a = Σaᵢ, b = Σbⱼ (bf16 words),
    keep the products with weight ≥ 2⁻⁸ᐧ⁽ᵖⁱᵉᶜᵉˢ⁻¹⁾ — for pieces=3 that is
    6 MXU passes, measured ~7 TFLOP/s effective and ~1e-7 relative error
    (f32-native grade). Used for the blocked factorization GEMMs
    (`ops/blocked_inverse.py`) where factor quality bounds the refinement
    contraction rate.

    Off-TPU (CPU, f64-capable GPUs) native f32 matmul at HIGHEST is
    already exact-f32 (HIGHEST also disables TF32 on GPU) — pass through.
    """
    if jax.default_backend() != "tpu":
        return jnp.matmul(a, b, precision=HIGHEST)
    ah = split_bf16(a, pieces)
    bh = split_bf16(b, pieces)
    # accumulate smallest-weight terms first
    out = None
    for s in range(pieces - 1, -1, -1):
        for i in range(s + 1):
            term = jnp.matmul(
                ah[i], bh[s - i], preferred_element_type=jnp.float32
            )
            out = term if out is None else out + term
    return out


def _ceil_log2(k: int) -> int:
    return int(np.ceil(np.log2(max(k, 2))))


def ozaki_params(k: int, bits: int = 55):
    """Slice width β and slice/pass counts for an exact-accumulation split.

    Exactness condition: every MXU pass accumulates integer-valued
    products, and the largest possible partial sum stays below 2²⁴ (the
    f32 integer-exact range), so the pass result is EXACT regardless of
    accumulation order: K·2^(2β) ≤ 2²⁴ → β = (24 − ⌈log₂K⌉)//2.

    ``bits`` is the mantissa coverage target (55 ≥ f64's 53); slices
    q = ⌈bits/β⌉ and pass cap i+j ≤ q−1 keep every product pair whose
    weight can reach the target precision.
    """
    beta = (24 - _ceil_log2(k)) // 2
    if beta < 2:
        raise ValueError(
            f"contraction width {k} too large for exact bf16-slice "
            "accumulation (needs K·4^β ≤ 2^24 with β ≥ 2) — chunk the "
            "contraction first"
        )
    beta = min(beta, 7)  # slice ints must stay exact in bf16 (≤ 2^8)
    q = int(np.ceil(bits / beta))
    return beta, q


def ozaki_split(x: jax.Array, axis: int, beta: int, q: int):
    """Split f64 ``x`` into q integer-valued bf16 slices on a power-of-2
    grid shared along ``axis`` (the contraction axis).

    Returns (slices [q× bf16 arrays], e scale with keepdims). Slice i
    holds round-to-nearest integers ≤ 2^β representing
    x ≈ e · Σᵢ intᵢ · 2^(−β(i+1)); the first slice's ints are ≤ 2^β and
    later ones ≤ 2^(β−1) (each remainder is half the previous grid).
    Elements more than ~β·q bits below their row/column max lose their
    tail — by construction that tail contributes < K·2^(−βq)·e_A·e_B to
    any dot product, i.e. below f64 round-off of the result unless the
    result cancels to ~2^(−βq) of its terms.
    """
    mag = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    e = jnp.exp2(jnp.ceil(jnp.log2(jnp.where(mag > 0, mag, 1.0))))
    r = x / e  # exact: e is a power of two
    slices = []
    for i in range(q):
        scale = float(2.0 ** (beta * (i + 1)))
        s = jnp.round(r * scale)
        slices.append(s.astype(jnp.bfloat16))  # ints ≤ 2^β ≤ 2^7: exact
        r = r - s / scale
    return slices, e


def ozaki_matmul(a: jax.Array, b: jax.Array, bits: int = 55) -> jax.Array:
    """f64-accurate matmul on TPU at bf16 MXU rates (Ozaki scheme).

    XLA's emulated-f64 matmul runs ~7 GFLOP/s on this chip (measured:
    13.6 ms for a [3456,3456]@[3456,2] HIGH-precision matvec) and loses
    8 digits beyond ~2.5k contraction. This routine instead computes

        C = Σ_{i+j≤q−1}  (e_A ⊗ e_B) · 2^(−β(i+j+2)) · (Sᵢ @ Tⱼ)

    where Sᵢ/Tⱼ are integer-valued bf16 slices (`ozaki_split`) whose MXU
    passes accumulate EXACTLY in f32 (integer partial sums < 2²⁴ — see
    `ozaki_params`), and the weighted recombination runs in f64. No
    accumulation-error growth with K: the only approximation is the
    dropped sub-2^(−β·q) tail of each operand (measured ≤ 2e-15 relative
    vs NumPy f64 at K up to 40k, incl. 1e12 dynamic range and
    residual-style cancellation).

    Measured v5e rates at [3456,3456]@[3456,n]: one-shot ≈ 7 ms (vs 8 ms
    emulated f64); pre-split LHS (`ozaki_prepare` + `ozaki_apply`, the
    refinement-loop pattern) ≈ 2-3 ms/apply — that cut the 100-point
    full-order sweep's refinement from 5.6 s to 1.7 s (sweep 7.75 s →
    4.1 s). The win is NOT the MXU FLOPs (everything here is HBM-bound);
    it is reading bf16 slices instead of f64 words and skipping the
    emulation's per-element overhead.

    Shapes: [..., m, k] @ [..., k, n] with standard broadcasting (vmap-
    compatible: only jnp ops on the last two axes).
    """
    prep = ozaki_prepare(a, bits=bits)
    return ozaki_apply(prep, b)


def ozaki_prepare(a: jax.Array, bits: int = 55):
    """Split the LHS once for reuse across many `ozaki_apply` calls.

    In refinement loops A is fixed while the right-hand side changes —
    the A-split (f64 elementwise work over the big matrix, ~4 ms at
    N=3456 on a v5e) is paid once here instead of per iteration
    (measured: 2.7 ms/apply prepared vs 6.9 ms re-splitting).
    """
    k = a.shape[-1]
    beta, q = ozaki_params(k, bits)
    sa, ea = ozaki_split(a, axis=-1, beta=beta, q=q)
    # slices flattened along the row axis ([..., q·m, k]) so one apply is
    # ONE bf16 matmul — see ozaki_apply
    return (jnp.concatenate(sa, axis=-2), ea, beta, q)


def ozaki_apply(prep, b: jax.Array) -> jax.Array:
    """a @ b with a pre-split LHS from `ozaki_prepare` — ONE bf16 matmul.

    The LHS slices arrive flattened along rows ([..., q·m, k]) and the
    RHS slices are concatenated along columns with their 2^(−β(j+1))
    weights folded in (a power-of-2 scale only shifts the bf16 exponent,
    so each column block still accumulates exactly on its own grid). The
    single [q·m, k] @ [k, q·p] product computes every slice pair (i, j)
    as its own output block — blocks never mix, so the
    integer-partial-sum < 2²⁴ exactness argument holds per block — and a
    q-term unrolled recombination (smallest weights first) finishes in
    f64.

    Why one matmul and not a loop: a `lax.scan` of MXU passes costs
    ~8-10 s of XLA compile PER APPLY INSTANCE at N≈3.4k (measured round
    3; the unrolled 55-matmul pair loop was minutes) — with ~7 applies
    inside the greedy while_loop body that dominated the cold compile.
    A flat matmul compiles like any other matmul. FLOPs: q²·m·k·p — for
    narrow RHS identical to the old LHS-stationary structure; for wide
    RHS ~1.8× the old i+j ≤ q−1 pair cap, a sub-ms cost at the [K, N]
    projection shapes that take this path.
    """
    sa_flat, ea, beta, q = prep  # sa_flat [..., q·m, k]
    n = b.shape[-1]
    # sub-8-lane outputs hit a pathological lowering (measured 29 ms vs
    # 6.9 ms at N=3456 for n=2 vs n=8) — pad narrow RHS
    pad = max(0, 8 - n)
    if pad:
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (pad,), b.dtype)], axis=-1
        )
    p_cols = n + pad
    sb, eb = ozaki_split(b, axis=-2, beta=beta, q=q)
    xcat = jnp.concatenate(
        [
            sb[j] * jnp.asarray(2.0 ** (-beta * (j + 1)), jnp.bfloat16)
            for j in range(q)
        ],
        axis=-1,
    )  # [..., k, q·p] bf16
    big = jnp.matmul(sa_flat, xcat, preferred_element_type=jnp.float32)
    m = sa_flat.shape[-2] // q
    shp = big.shape[:-2] + (q, m, q, p_cols)
    blocks = big.reshape(shp)
    bj = jnp.sum(blocks.astype(jnp.float64), axis=-2)  # [..., q, m, p]
    out = jnp.zeros(bj.shape[:-3] + (m, p_cols), jnp.float64)
    for i in range(q - 1, -1, -1):  # smallest weights first
        out = out + float(2.0 ** (-beta * (i + 1))) * bj[..., i, :, :]
    out = out * (ea * eb)
    return out[..., :n] if pad else out


def precise_matmul_many(a: jax.Array, bs, impl: str = "auto") -> tuple:
    """``(a @ b for b in bs)`` with ONE LHS split and ONE apply.

    Trace-size/runtime optimization for compiled loops (the greedy body
    projects four operands against the same Qᵀ every iteration): on the
    TPU real-f64 ozaki path the LHS is prepared once and the right-hand
    sides are CONCATENATED into a single apply — each `ozaki_apply`
    instance costs ~8 s of XLA compile at N≈3.4k (measured, round 3), so
    four separate applies in a while_loop body were a material part of
    the greedy cold-compile. Elsewhere this is a loop of
    `precise_matmul`.

    ``impl="chunked"`` routes the concatenated product through
    `precise_matmul_chunked` instead (2 HLO matmuls, ~1.4 s compile, vs
    ~10 s for an ozaki instance) — the COMPILE-cost trade for narrow
    products inside compiled loops. Same ~1e-15 accuracy class (chunk
    partial sums accumulate in emulated f64); runtime is the emulated-f64
    matmul's, fine for [K,N]@[N, few·K] shapes, ruinous for wide ones.
    """
    widths = [b.shape[-1] for b in bs]
    bounds = np.cumsum(widths)[:-1].tolist()
    wide = all(
        jnp.result_type(a.dtype, b.dtype)
        in (jnp.dtype(jnp.float64),)
        for b in bs
    )
    if impl == "chunked":
        work = jnp.result_type(a.dtype, *(b.dtype for b in bs))
        cat = jnp.concatenate([b.astype(work) for b in bs], axis=-1)
        out = precise_matmul_chunked(a.astype(work), cat)
        return tuple(jnp.split(out, bounds, axis=-1))
    k = a.shape[-1]
    if (
        wide
        and OZAKI_MIN_K <= k <= (1 << 20)
        and jax.default_backend() == "tpu"
    ):
        prep = ozaki_prepare(a.astype(jnp.float64))
        cat = jnp.concatenate(
            [b.astype(jnp.float64) for b in bs], axis=-1
        )
        out = ozaki_apply(prep, cat)
        return tuple(jnp.split(out, bounds, axis=-1))
    return tuple(precise_matmul(a, b) for b in bs)


def precise_gram(a: jax.Array, b: jax.Array) -> jax.Array:
    """aᵀ·b contracting the LEADING axis accurately: [n, k]ᵀ·[n, l] → [k, l].

    Convenience wrapper for the Gram-style products (QᵀQ, QᵀB, UᵀU) whose
    contraction runs over the big N axis.
    """
    return precise_matmul(jnp.swapaxes(a, -1, -2), b)
