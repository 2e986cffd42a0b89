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


def precise_gram(a: jax.Array, b: jax.Array) -> jax.Array:
    """aᵀ·b contracting the LEADING axis accurately: [n, k]ᵀ·[n, l] → [k, l].

    Convenience wrapper for the Gram-style products (QᵀQ, QᵀB, UᵀU) whose
    contraction runs over the big N axis.
    """
    return precise_matmul(jnp.swapaxes(a, -1, -2), b)
