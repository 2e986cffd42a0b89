"""Accurate f64 matmuls on TPU: chunked contractions.

TPU's emulated float64 matmul silently loses precision once the
CONTRACTION dimension exceeds ~2.5k: measured on a v5e, QᵀQ with a 2048-
long contraction is accurate to 2.5e-15 but jumps to 1.1e-7 at 3072 and
degrades further with size — independent of the `precision=` argument
(the double-float emulation apparently drops its compensation term in the
large-K kernel). That single behavior capped the whole MOR pipeline at
~3e-7 at the reference's N = 3411: snapshot refinement, Gram projections
and basis orthonormality all floor there.

`precise_matmul` restores full f64 accuracy by splitting the contraction
into ≤2048-wide chunks and summing the partial products with (accurate)
elementwise f64 adds: measured 2.2e-15 at an 8192-long contraction. Same
FLOPs, a few extra adds.

Narrow dtypes (f32/bf16 compute) pass straight through — chunking is a
pure f64/c128 concern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

# measured safe contraction width for TPU's emulated f64 matmul
F64_SAFE_CONTRACTION = 2048


def _needs_chunking(a: jax.Array, b: jax.Array) -> bool:
    wide = jnp.result_type(a.dtype, b.dtype) in (
        jnp.dtype(jnp.float64),
        jnp.dtype(jnp.complex128),
    )
    return wide and a.shape[-1] > F64_SAFE_CONTRACTION + 512


def precise_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """matmul(a, b) with f64-accurate chunked contraction.

    a: [..., m, k], b: [..., k, n] (standard matmul broadcasting). Uses
    HIGHEST precision either way; chunks the k axis for wide f64 inputs.
    """
    if not _needs_chunking(a, b):
        return jnp.matmul(a, b, precision=HIGHEST)
    vector_rhs = b.ndim == 1
    if vector_rhs:
        b = b[:, None]
    k = a.shape[-1]
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

    On CPU, native f32 matmul is already exact-f32 — pass through.
    """
    if jax.default_backend() == "cpu":
        return jnp.matmul(a, b)
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


def precise_gram(a: jax.Array, b: jax.Array) -> jax.Array:
    """aᵀ·b contracting the LEADING axis accurately: [n, k]ᵀ·[n, l] → [k, l].

    Convenience wrapper for the Gram-style products (QᵀQ, QᵀB, UᵀU) whose
    contraction runs over the big N axis.
    """
    return precise_matmul(jnp.swapaxes(a, -1, -2), b)
