"""Pallas row gather — DMA-bound `src[g, idx[g]]` for the panel-LU factors.

Why this kernel exists. The blocked LU (`ops/panel_lu.py`, the dense
`splu` replacement — reference role /root/reference/implementation.py:
474-478) needs two batched row gathers per factorization:

  * the pivot rows of the trailing block, once per panel step, and
  * the final permutation of the whole factor into textbook order.

XLA's row `take` on TPU lowers to per-index dynamic-slice chains two
orders of magnitude off bandwidth (measured 1.7 ms per [8, 3456, W]
take, round 2). The round-2/3 workaround, `pivot_rows_mxu`, re-cast the
gather as a one-hot MXU contraction — exact, but it paid THREE full
bf16 matmul passes over the trailing block plus an HBM materialization
of its 3-word split: for a 128-row gather that is ~half the FLOPs of
the trailing update itself spent on *data movement*.

A gather is a DMA problem, not a FLOP problem. Mosaic cannot DMA a
single row from a (8,128)-tiled HBM buffer (slice shapes along tiled
dims must be 8-aligned — verified on the v5e), so the kernel fetches
the 8-row aligned *group* containing each requested row instead, and
lets the ordinary Pallas pipeline do all the DMAs: eight input specs
alias the same source, and each spec's `index_map` reads the requested
row's group index from the scalar-prefetched index vector
(`PrefetchScalarGridSpec` — the standard sparse-gather pattern). The
kernel body then selects the right sublane with an exact 0/1
mask-and-sum (one nonzero term per lane — no rounding), which the VPU
does in the DMA shadow. Traffic is 8 sublanes per gathered row
(read) + the row (write): ~9/(2·N) of the one-hot contraction's, and
the MXU does nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RPP = 8  # rows gathered per program == sublane tile of f32 in HBM


def _gather_kernel(idx_ref, *refs):
    in_refs, out_ref = refs[:_RPP], refs[_RPP]
    gi = pl.program_id(0)
    pi = pl.program_id(1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_RPP, 1), 0)
    for k in range(_RPP):
        r = idx_ref[gi, pi * _RPP + k] % _RPP
        mask = (sub == r).astype(out_ref.dtype)  # exactly one 1.0
        out_ref[0, k, :] = jnp.sum(in_refs[k][0] * mask, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    src: jax.Array,  # [G, N, W]
    idx: jax.Array,  # [G, P] integer row indices into axis 1
    interpret: bool = False,
) -> jax.Array:
    """Batched row gather ``src[g, idx[g], :]`` → [G, P, W], DMA-bound.

    Contract: f32 source only — the 8-rows-per-group design IS the f32
    (8, 128) HBM tile; a bf16 source lives in (16, 128) tiles and would
    violate the 8-aligned slice assumption the group DMAs are built on.
    P a multiple of 128 (every panel-LU use gathers whole 128-row panels
    or the 128-padded full permutation), N a sublane multiple, W a lane
    multiple. Exact: the sublane select is a 0/1 mask-sum with a single
    nonzero term per lane.
    """
    g, n, w = src.shape
    g2, p = idx.shape
    if src.dtype != jnp.float32:
        raise ValueError(
            f"gather_rows is f32-only (tile-size contract), got {src.dtype}"
        )
    if g != g2:
        raise ValueError(f"batch mismatch: src {src.shape}, idx {idx.shape}")
    if p % 128:
        raise ValueError(f"gather_rows needs P % 128 == 0, got P={p}")
    if n % _RPP:
        raise ValueError(f"gather_rows needs N % {_RPP} == 0, got N={n}")
    if w % 128:
        raise ValueError(f"gather_rows needs a lane-multiple W, got W={w}")

    idx32 = idx.astype(jnp.int32)

    def spec_for(k):
        # Block (1, 8, W): the 8-row aligned group holding requested
        # row pi*8+k. Block index along N is the *group* index.
        return pl.BlockSpec(
            (1, _RPP, w),
            lambda gi, pi, idx_ref, k=k: (gi, idx_ref[gi, pi * _RPP + k] // _RPP, 0),
        )

    with jax.enable_x64(False):  # x64 tracing emits i64 Mosaic can't lower
        out = pl.pallas_call(
            _gather_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(g, p // _RPP),
                in_specs=[spec_for(k) for k in range(_RPP)],
                out_specs=pl.BlockSpec(
                    (1, _RPP, w), lambda gi, pi, idx_ref: (gi, pi, 0)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((g, p, w), src.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * g * p * _RPP * w,
                bytes_accessed=(_RPP + 1) * g * p * w * src.dtype.itemsize,
                transcendentals=0,
            ),
        )(idx32, *([src] * _RPP))
    return out
