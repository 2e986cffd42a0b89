"""Fused multi-word bf16 matmul — f32-TRUE GEMM with ONE output pass.

`ops/precision.py::matmul_f32_accurate` realizes an f32-true product as
6 bf16 MXU passes (3-word Dekker splits, products with weight ≥ 2⁻¹⁶
kept). As separate XLA dots each pass materializes its own [M, N]
partial product in HBM and the accumulation read-modify-writes the full
output — ~11 HBM passes over the largest array in the computation. For
the blocked-LU trailing updates (`ops/panel_lu.py`, the dense `splu`
replacement — reference role /root/reference/implementation.py:474-478)
that traffic IS the cost: the round-3 on-chip probe measured the f32x6
factor at 188 ms vs 85 ms for the 3-pass trail at G=16, N=3456 — a
~103 ms delta for 2× the MXU work, i.e. bandwidth-bound.

This kernel fuses the whole scheme: per [TM, TN] output tile, both
operand tiles are split into bf16 words IN VMEM (`lax.reduce_precision`
— exact rounding; see the excess-precision landmine note in
`split_bf16`), all 6 products accumulate in a VMEM f32 register tile
(smallest weight first, matching `matmul_f32_accurate`'s ordering), the
optional addend tile is applied, and the output is written ONCE. HBM
traffic drops to the matmul minimum: operands × (reuse factor) +
addend read + one output write.

Used by the panel-LU factors for every O(N³) trailing GEMM; shapes
there are multiples of the 128 lane width by construction (the factor
pads N up front), which is what the tile-divisibility contract below
relies on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_words(x, words):
    """In-VMEM bf16 word split by bit masking with round-to-nearest.

    Mosaic has no `reduce_precision` lowering, so the word is built from
    the f32 bit pattern directly: add half a kept-ulp (0x8000) to the
    pattern, mask the low 16 bits — round-half-away on the magnitude for
    either sign (IEEE patterns are magnitude-ordered below the sign bit;
    a mantissa carry rolls into the exponent, which is still correct
    rounding). The result is exactly a bf16 value (sign + exponent + 7
    mantissa bits) and the residual subtraction is exact in f32, so the
    split is exact — same accuracy class as `split_bf16`, measured on
    chip within 2e-7 of the XLA 6-pass scheme (truncation instead of
    rounding costs ~1 bit per word and doubled the factor residual, so
    the rounding matters). The bf16 astype of a masked value is
    value-preserving by construction, so no excess-precision elision can
    zero a word (the `split_bf16` landmine).
    """
    parts = []
    mask = jnp.uint32(0xFFFF0000)
    half = jnp.uint32(0x8000)
    r = x
    for _ in range(words):
        bits = jax.lax.bitcast_convert_type(r, jnp.uint32)
        h32 = jax.lax.bitcast_convert_type((bits + half) & mask,
                                           jnp.float32)
        # the +half carry on a NaN payload >= 0x7FFF8000 rolls into the
        # sign bit (0x80000000 = -0.0), silently turning NaN into 0 in
        # the product; select keeps NaN words NaN so they propagate like
        # split_bf16/reduce_precision does
        h32 = jnp.where(jnp.isnan(r), r, h32)
        parts.append(h32.astype(jnp.bfloat16))
        r = r - h32
    return parts


def _mm_kernel(c_ref, r_ref, t_ref, o_ref, *, words, sign):
    cw = _split_words(c_ref[:], words)
    rw = _split_words(r_ref[:], words)
    acc = None
    # smallest-weight products first (matmul_f32_accurate's ordering)
    for s in range(words - 1, -1, -1):
        for i in range(s + 1):
            term = jnp.dot(cw[i], rw[s - i],
                           preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    if t_ref is not None:
        acc = t_ref[:] + sign * acc
    elif sign < 0:
        acc = -acc
    o_ref[:] = acc


def _pick_tile(dim: int, cap: int) -> int:
    for t in (512, 384, 256, 128):
        if t <= cap and dim % t == 0:
            return t
    return 0


def fusable(m: int, k: int, n: int) -> bool:
    """Static shape gate for `mm_words`: every dim a multiple of 128 and
    the K panel small enough that both operand tiles + words fit VMEM."""
    return (
        m % 128 == 0 and n % 128 == 0 and k % 128 == 0 and k <= 768
        and jax.default_backend() == "tpu"
    )


@functools.partial(
    jax.jit, static_argnames=("words", "sign", "interpret")
)
def mm_words(
    c: jax.Array,  # [G, M, K] f32
    r: jax.Array,  # [G, K, N] f32
    t: jax.Array | None = None,  # [G, M, N] f32 addend (optional)
    words: int = 3,
    sign: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """t + sign·(c @ r), f32-true, one HBM pass over the output.

    Contract: M, N multiples of a pickable tile (128 divides them), K a
    lane multiple that fits VMEM alongside the tiles (`fusable` gates).
    """
    g, m, k = c.shape
    g2, k2, n = r.shape
    if g != g2 or k != k2:
        raise ValueError(f"shape mismatch {c.shape} @ {r.shape}")
    if k % 128:
        raise ValueError(
            f"mm_words needs K a lane multiple (128), got K={k}"
        )
    if t is not None and t.shape != (g, m, n):
        raise ValueError(
            f"addend shape {t.shape} != {(g, m, n)}"
        )
    f32 = jnp.float32
    # VMEM budget per program: each operand tile lives as f32 plus
    # `words` bf16 word copies (4 + 2·words bytes/elt), plus t/o/acc
    def vmem_bytes(tm, tn):
        per = 4 + 2 * words
        out_n = (2 if t is None else 3) * tm * tn * 4
        return per * (tm * k + k * tn) + out_n

    tm = _pick_tile(m, 512)
    tn = _pick_tile(n, 512)
    while tm and tn and vmem_bytes(tm, tn) > 10 * 2**20:
        if tm >= tn:
            tm = _pick_tile(m, tm - 1)
        else:
            tn = _pick_tile(n, tn - 1)
    if not (tm and tn):
        raise ValueError(
            f"mm_words needs 128-divisible M/N fitting VMEM, got "
            f"M={m} K={k} N={n}"
        )

    c2d = c.reshape(g * m, k).astype(f32)
    r2d = r.reshape(g * k, n).astype(f32)
    mi, ni = m // tm, n // tn
    grid = (g, mi, ni)
    # 2D refs with g folded into rows (3D tiled BlockSpecs are fragile
    # on this Mosaic version — same layout rule as panel_factor.py)
    in_specs = [
        pl.BlockSpec((tm, k), lambda gi, i, j: (gi * (m // tm) + i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, tn), lambda gi, i, j: (gi, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [c2d, r2d]
    if t is not None:
        in_specs.append(
            pl.BlockSpec((tm, tn),
                         lambda gi, i, j: (gi * (m // tm) + i, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(t.reshape(g * m, n).astype(f32))
        kernel = functools.partial(_mm_kernel, words=words, sign=sign)
    else:
        kernel = functools.partial(
            lambda cr, rr, orf, **kw: _mm_kernel(cr, rr, None, orf, **kw),
            words=words, sign=sign,
        )
    npasses = words * (words + 1) // 2
    with jax.enable_x64(False):  # x64 tracing emits i64 Mosaic can't lower
        out2d = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tm, tn), lambda gi, i, j: (gi * (m // tm) + i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((g * m, n), f32),
            cost_estimate=pl.CostEstimate(
                flops=npasses * 2 * g * m * n * k,
                bytes_accessed=int(
                    (4 + 2 * words) * g * (m * k * ni + k * n * mi)
                    + (2 if t is None else 3) * 4 * g * m * n
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(*operands)
    return out2d.reshape(g, m, n)
