"""Banded SpMV Pallas kernel — the TPU-native sparse operator application.

FEM discretizations (the reference's Ct/Tt and its `diagonal_heavy_matrix`
generator, experiments.py:9-24) are banded: nonzeros live within a fixed
distance of the diagonal. On TPU, gather-based sparse formats (BCOO) lower
to slow scatter/gather loops; the native layout is DIAGONAL storage:

    band[i, d] = A[i, i + d − half]            band: [N, BW]

so the matvec is BW shifted elementwise multiply-accumulates:

    y[i] = Σ_d band[i, d] · x[i + d − half]

This kernel tiles the rows across the grid; each tile loads its [T, BW]
band block and a [T + BW − 1, M] halo of x, and accumulates the BW
diagonal products with static sublane shifts — pure VPU work, no gathers,
~N·BW·M FLOPs at memory-bandwidth speed.

`BandedOperator` adapts (SciPy sparse / dense) matrices into this layout
and plugs into the iterative solvers as a drop-in A(t)·x application.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from morfem_tpu.utils.pytreereg import register_operator_pytree


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def to_banded(a, bandwidth: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Convert a (dense / SciPy sparse) matrix to diagonal storage.

    Returns (band [N, 2·half+1], half). Entries outside the band are
    dropped — callers should pick `bandwidth` ≥ the true half-bandwidth
    (auto-detected from the sparsity when omitted).
    """
    import scipy.sparse as sp

    if sp.issparse(a):
        coo = a.tocoo()
        n = coo.shape[0]
        if bandwidth is None:
            bandwidth = int(np.max(np.abs(coo.row - coo.col))) if coo.nnz else 0
        half = bandwidth
        band = np.zeros((n, 2 * half + 1), dtype=coo.data.dtype)
        d = coo.col - coo.row + half
        keep = (d >= 0) & (d < 2 * half + 1)
        band[coo.row[keep], d[keep]] = coo.data[keep]
        return band, half
    a = np.asarray(a)
    n = a.shape[0]
    if bandwidth is None:
        nz = np.nonzero(a)
        bandwidth = int(np.max(np.abs(nz[0] - nz[1]))) if nz[0].size else 0
    half = bandwidth
    band = np.zeros((n, 2 * half + 1), dtype=a.dtype)
    for d in range(-half, half + 1):
        diag = np.diagonal(a, offset=d)
        rows = np.arange(max(0, -d), max(0, -d) + diag.size)
        band[rows, d + half] = diag
    return band, half


def _banded_matvec_kernel(
    band_ref,  # [T, BWp] f32 — row tile of the band
    x_ref,  # [half + N + pad + half + T, Mp] f32 — whole halo'd x
    out_ref,  # [T, Mp] f32
    *,
    half: int,
    bw: int,
    tile: int,
):
    base = pl.program_id(0) * tile  # this tile's first row in x's halo frame
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # unrolled loop over the diagonals: each is a sublane-shifted dynamic
    # slice of the halo'd x times one band column — VPU multiply-accumulate
    for d in range(bw):
        xs = x_ref[pl.ds(base + d, tile), :]
        acc = acc + band_ref[:, d : d + 1] * xs
    out_ref[:] = acc


def pad_band(band: jax.Array, tile: int = 256):
    """Pre-pad diagonal storage for the kernel: [N, BW] → [N_pad, BWp].

    Do this ONCE outside any solver loop: operands computed inside a
    while-loop body get stack-allocated in VMEM by the memory planner and
    a ~50 MB padded band blows the 16 MB scoped limit; a hoisted
    loop-invariant operand stays in HBM and streams per tile.
    """
    n, bw = band.shape
    f32 = jnp.float32
    bwp = _round_up(bw, 128)
    grid_n = pl.cdiv(n, tile)
    n_pad = grid_n * tile - n
    return jnp.zeros((n + n_pad, bwp), f32).at[:n, :bw].set(band.astype(f32))


def banded_matvec_padded(
    band_p: jax.Array,  # [N_pad, BWp] — from `pad_band`
    n: int,
    bw: int,
    half: int,
    x: jax.Array,  # [N, M]
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """y = A·x with a pre-padded band — fused halo'd kernel, f32 compute."""
    # Mosaic only compiles for TPU; on the CPU backend (unit tests,
    # virtual meshes) fall back to interpret mode automatically.
    interpret = interpret or jax.default_backend() == "cpu"
    m = x.shape[1]
    f32 = jnp.float32
    mp = _round_up(max(m, 8), 8)
    grid_n = pl.cdiv(n, tile)
    n_pad = grid_n * tile - n
    # x with `half` zero rows of halo on each side (plus tile padding)
    x_p = jnp.zeros((half + n + n_pad + half + tile, mp), f32)
    x_p = x_p.at[half : half + n, :m].set(x.astype(f32))

    kernel = functools.partial(
        _banded_matvec_kernel, half=half, bw=bw, tile=tile
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(
                    (tile, band_p.shape[1]), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                # halo'd x: tile i reads rows [i·tile, i·tile + tile + 2·half)
                # of the padded buffer; expressed in block units of `tile`
                # via an overlapping window (block size tile + 2·half would
                # need non-multiple strides, so we pass the whole x — it is
                # [N, M]-small — and slice dynamically)
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile, mp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n + n_pad, mp), f32),
            # XLA stack-allocates while-loop-fed operands in VMEM; allow
            # more than the 16 MB default scoped budget (v5e has 128 MB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(band_p, x_p)
    return out[:n, :m]


def banded_matvec(
    band: jax.Array,  # [N, BW] diagonal storage (BW = 2·half+1)
    half: int,
    x: jax.Array,  # [N, M]
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """y = A·x for a banded A (pads the band inline — for one-shot use;
    loops should `pad_band` once and call `banded_matvec_padded`)."""
    n, bw = band.shape
    return banded_matvec_padded(
        pad_band(band, tile), n, bw, half, x, tile=tile, interpret=interpret
    )


# Above this bandwidth the per-diagonal formulations become COMPILE bombs:
# both the VPU kernel and the jnp reference matvec spell out one
# shifted multiply-add PER DIAGONAL (a Python loop), so a BW=387 operator
# unrolls to ~400 HLO/Mosaic ops — measured 46 s of XLA compile for ONE
# f32 matvec instance and ~126 s for the estimator's three f64 applies at
# N=9.4k (round 5). Wide bands route to `banded_matvec_blocked` instead:
# the SAME operator as block-tridiagonal (L, D, U) blocks — three batched
# GEMMs, a handful of HLO ops, MXU work. The per-diagonal forms stay for
# narrow bands, where they are both cheaper to compile and faster (the
# GEMM form pays 3·block/BW ≈ 8× the FLOPs at BW ≈ 50).
WIDE_BW = 96


def banded_matvec_blocked(
    band: jax.Array,  # [N, BW] diagonal storage
    half: int,
    x: jax.Array,  # [N, M] (or [N])
    precision=None,
) -> jax.Array:
    """y = A·x as block-tridiagonal GEMMs — the wide-band matvec.

    Exact reformulation for any block ≥ half (uses `band_to_blocks`):
    y_I = L_I·x_{I−1} + D_I·x_I + U_I·x_{I+1}. Costs 3·nb·b²·M FLOPs on
    the MXU vs N·BW·M on the VPU, but compiles to a constant number of
    ops regardless of bandwidth. ``precision`` defaults to HIGHEST for
    ≥64-bit dtypes (refinement residual quality) and HIGH for f32 (the
    Krylov-loop operator; HIGHEST f32 matmuls fall off a software cliff
    on this platform — see ops/precision.py).
    """
    from morfem_tpu.ops.block_tridiag import band_to_blocks

    n = band.shape[0]
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if jnp.finfo(x.dtype).bits > 32
            else jax.lax.Precision.HIGH
        )
    b = max(128, _round_up(half, 128))
    l, d, u = band_to_blocks(band, half, b)
    nb = l.shape[0]
    m = x.shape[1]
    xp = jnp.zeros((nb * b, m), x.dtype).at[:n].set(x)
    xb = xp.reshape(nb, b, m)
    zero = jnp.zeros((1, b, m), x.dtype)
    x_prev = jnp.concatenate([zero, xb[:-1]], axis=0)
    x_next = jnp.concatenate([xb[1:], zero], axis=0)
    ld = l.astype(x.dtype)
    dd = d.astype(x.dtype)
    ud = u.astype(x.dtype)
    y = (
        jnp.matmul(ld, x_prev, precision=precision)
        + jnp.matmul(dd, xb, precision=precision)
        + jnp.matmul(ud, x_next, precision=precision)
    )
    y = y.reshape(nb * b, m)[:n]
    return y[:, 0] if squeeze else y


def combine_addends(c: jax.Array, stacked: jax.Array) -> jax.Array:
    """Σ_p c_p·S_p over the leading addend axis of [P, ...] storage.

    The one place the affine combination is spelled out — every operator
    accepts an arbitrary addend count P (the classic pencil is P=3;
    complex-coefficient systems ride the interleaved embedding as P=6,
    mor/api.py)."""
    return jnp.tensordot(c, stacked, axes=1)


class BandedAffineOperator:
    """A(t)·x applications with banded Pallas matvecs.

    Drop-in alternative to `morfem_tpu.ops.sparse.SparseAffineOperator`
    (same `matvec`/`diagonal` interface, so `solve_point_iterative`
    accepts it): the P operator addends (any count; the classic pencil
    is 3) are stored in diagonal form and pre-symmetrized on the host,
    the per-point matvec combines the bands elementwise and runs ONE
    fused Pallas kernel. Measured 14.5× faster than the BCOO matvec at
    N=100k, half-bandwidth 25, on a v5e.
    """

    def __init__(
        self,
        *mats,
        symmetrize: bool = True,
        tile: int = 512,
        bandwidth: Optional[int] = None,
    ):
        """``bandwidth`` (optional): TRUNCATE every addend to this
        half-bandwidth — entries further from the diagonal are dropped.
        The result then represents only the in-band part of the pencil;
        use it as a PRECONDITIONER for the exact operator, never as the
        operator itself (ops/block_tridiag.py::general_sparse_solve)."""
        import scipy.sparse as sp

        def prep(a):
            if symmetrize:
                a = (a + a.T) * 0.5 if not sp.issparse(a) else (a + a.T) * 0.5
            return a

        mats = [prep(a) for a in mats]
        if any(
            np.iscomplexobj(m.data if sp.issparse(m) else np.asarray(m))
            for m in mats
        ):
            raise ValueError(
                "BandedAffineOperator stores real bands; lift complex "
                "operators through the interleaved real embedding first "
                "(ops/complex_split.embed_sparse_interleaved — morfem() "
                "does this automatically)"
            )
        halves = []
        bands = []
        for a in mats:
            band, h = to_banded(a, bandwidth=bandwidth)
            bands.append(band)
            halves.append(h)
        self.half = max(halves)
        n = bands[0].shape[0]
        bw = 2 * self.half + 1
        aligned = np.zeros((len(mats), n, bw), dtype=np.float64)
        for p, (band, h) in enumerate(zip(bands, halves)):
            aligned[p, :, self.half - h : self.half + h + 1] = band
        self.tile = tile
        self.n = n
        self.bw = bw
        self.bands_w = jnp.asarray(aligned)  # working-dtype bands [P, N, BW]
        if bw > WIDE_BW:
            # wide bands: `bind` runs the blocked-GEMM matvec straight off
            # bands_w; the padded VPU-kernel operand would only burn HBM
            # ([P, N_pad, BW_pad] f32 — ~316 MB at N=34k, BW=751)
            self.bands_p = jnp.zeros((len(mats), 0, 0), jnp.float32)
        else:
            # pre-padded kernel operands, combined per-t in `bind`
            self.bands_p = jnp.stack(
                [pad_band(jnp.asarray(a), tile) for a in aligned]
            )
        self.diags = jnp.asarray(aligned[:, :, self.half])  # [P, N]

    @property
    def n_addends(self) -> int:
        return self.bands_w.shape[0]

    def bind(self, c: jax.Array):
        """Combine the bands for coefficients c ONCE (outside solver loops)
        and return the bound matvec closure (f32 compute either way)."""
        if self.bw > WIDE_BW:
            band_t = combine_addends(c, self.bands_w).astype(jnp.float32)

            def mv(x):
                return banded_matvec_blocked(
                    band_t, self.half, x.astype(jnp.float32)
                ).astype(x.dtype)

            return mv
        band_p = combine_addends(c, self.bands_p).astype(
            jnp.float32
        )  # the kernel computes in f32

        def mv(x):
            squeeze = x.ndim == 1
            if squeeze:
                x = x[:, None]
            y = banded_matvec_padded(
                band_p, self.n, self.bw, self.half, x, tile=self.tile
            ).astype(x.dtype)
            return y[:, 0] if squeeze else y

        return mv

    def matvec(self, c: jax.Array, x: jax.Array) -> jax.Array:
        return self.bind(c)(x)

    def bind_precise(self, c: jax.Array):
        """f64 (working-dtype) matvec closure for refinement residuals."""
        band_t = combine_addends(c, self.bands_w)
        return lambda x: banded_matvec_ref(band_t, self.half, x)

    def apply_addend(self, p: int, x: jax.Array) -> jax.Array:
        """A_p·x for one (pre-symmetrized) addend in working dtype.

        Per-addend application for the matrix-free greedy estimator
        (mor/greedy_matfree.py): runs the reference banded matvec on the
        working-dtype bands — O(N·BW·M), cheap even in emulated f64.
        """
        return banded_matvec_ref(self.bands_w[p], self.half, x)

    def diagonal(self, c: jax.Array) -> jax.Array:
        return combine_addends(c, self.diags)


# jit-argument capable (buffers as parameters, not HLO constants) — see
# utils/pytreereg.py
register_operator_pytree(
    BandedAffineOperator,
    ("bands_p", "bands_w", "diags"),
    ("half", "tile", "n", "bw"),
)


def banded_matvec_ref(band: jax.Array, half: int, x: jax.Array) -> jax.Array:
    """Reference banded matvec in plain jnp (any dtype, e.g. f64).

    O(N·BW·M) elementwise work — cheap even in TPU's emulated f64; used as
    the high-precision residual operator around the f32 kernel. Wide bands
    take the blocked-GEMM form: the per-diagonal loop below unrolls into
    BW HLO ops (a compile bomb at BW ≈ 400+, see WIDE_BW).
    """
    n = band.shape[0]
    bw = band.shape[1]
    if bw > WIDE_BW:
        return banded_matvec_blocked(band, half, x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    x_pad = jnp.zeros((n + 2 * half, x.shape[1]), x.dtype)
    x_pad = x_pad.at[half : half + n].set(x)
    y = jnp.zeros((n, x.shape[1]), x.dtype)
    for d in range(bw):
        y = y + band[:, d : d + 1] * jax.lax.dynamic_slice_in_dim(
            x_pad, d, n, axis=0
        )
    return y[:, 0] if squeeze else y
