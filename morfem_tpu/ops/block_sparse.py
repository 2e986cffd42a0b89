"""Block-sparse (BSR) operators — the TPU-native general-sparsity format.

The reference keeps general sparsity in SciPy CSC and applies it on the
host (implementation.py:474-480, 526-528). On TPU, element-wise sparse
formats (BCOO) lower to gather/scatter loops that leave the MXU idle; the
hardware-native representation of *unstructured* sparsity is DENSE BLOCKS
on a sparse block grid:

    A = Σ_k  blocks[k]  placed at  (block_rows[k]·BR, block_cols[k]·BC)

so the matvec is one batched [BR, BC] x [BC, M] contraction per stored
block plus a segment-sum over row blocks — all MXU/VPU work, no per-element
gathers. FEM matrices under RCM cluster their nonzeros near the diagonal,
so the block fill ratio stays high and the dense-block inflation is small
(`BlockSparseAffineOperator.inflation` reports it; the matrix-free router
falls back to BCOO when blocking would waste memory).

Two application paths:

  * `bsr_matmul` — plain-XLA gather + batched matmul + segment-sum. Works
    on every backend in every dtype; in float64 each contraction is only
    BC (=128) long, comfortably inside the range where TPU's emulated-f64
    matmul is still accurate (ops/precision.py documents the ~2.5k cliff).
  * `bsr_matmul_pallas` — a scalar-prefetch Pallas kernel (f32): the block
    row/col indices ride in SMEM and steer the BlockSpec index maps, the
    output block accumulates in VMEM across consecutive grid steps of the
    same block row. The fast path for Krylov inner iterations.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.utils.pytreereg import register_operator_pytree
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bsr_from_scipy(
    mats,
    n: int,
    block_rows: int = 32,
    block_cols: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Block-partition a list of same-shape SciPy matrices on a SHARED grid.

    The shared (union) pattern lets an affine pencil combine per-block
    values elementwise (c0·B0[k] + c1·B1[k] + c2·B2[k]) without touching
    the indices. Every block row is guaranteed at least one stored block
    (a zero diagonal block if needed) so a kernel that initializes output
    blocks on first visit covers the whole output.

    Returns (vals [P, nb, BR, BC], brows [nb] i32, bcols [nb] i32,
    nbr, nbc) with blocks sorted by (brow, bcol).
    """
    import scipy.sparse as sp

    nbr = -(-n // block_rows)
    nbc = -(-n // block_cols)
    coos = [m.tocoo() for m in mats]
    keys = [
        (coo.row // block_rows).astype(np.int64) * nbc
        + (coo.col // block_cols).astype(np.int64)
        for coo in coos
    ]
    union = np.unique(np.concatenate(keys)) if keys else np.zeros(0, np.int64)
    # every block row must appear at least once (see docstring)
    present_rows = np.unique(union // nbc) if union.size else np.zeros(0, np.int64)
    missing = np.setdiff1d(np.arange(nbr, dtype=np.int64), present_rows)
    if missing.size:
        # place the filler on the (clamped) diagonal block
        union = np.sort(
            np.concatenate([union, missing * nbc + np.minimum(missing * block_rows // block_cols, nbc - 1)])
        )
    nb = union.size
    vals = np.zeros((len(mats), nb, block_rows, block_cols))
    for p, (coo, key) in enumerate(zip(coos, keys)):
        bids = np.searchsorted(union, key)
        np.add.at(
            vals[p],
            (bids, coo.row % block_rows, coo.col % block_cols),
            coo.data,
        )
    brows = (union // nbc).astype(np.int32)
    bcols = (union % nbc).astype(np.int32)
    return vals, brows, bcols, nbr, nbc


def bsr_matmul(
    vals: jax.Array,  # [nb, BR, BC] block values
    brows: jax.Array,  # [nb] i32 (sorted)
    bcols: jax.Array,  # [nb] i32
    nbr: int,
    nbc: int,
    n: int,
    x: jax.Array,  # [N, M] (or [N])
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """y = A·x on the XLA path: gather x blocks, batched matmul, segment-sum.

    Any backend, any dtype; float64 contractions are BC-long (≤128), so
    TPU's emulated-f64 accuracy cliff (ops/precision.py) is never hit.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    br, bc = vals.shape[-2], vals.shape[-1]
    m = x.shape[1]
    xp = jnp.zeros((nbc * bc, m), x.dtype).at[:n].set(x)
    gathered = xp.reshape(nbc, bc, m)[bcols]  # [nb, BC, M]
    yb = jnp.matmul(vals.astype(x.dtype), gathered, precision=precision)
    y = jax.ops.segment_sum(yb, brows, num_segments=nbr)  # [nbr, BR, M]
    y = y.reshape(nbr * br, m)[:n]
    return y[:, 0] if squeeze else y


def _bsr_kernel(brows_ref, bcols_ref, vals_ref, x_ref, y_ref):
    """One stored block per grid step; output accumulates across a block row.

    `brows` is sorted, so all steps hitting one output block are
    consecutive — the block stays resident in VMEM between them and is
    zeroed on first visit.
    """
    i = pl.program_id(0)
    prev = brows_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, brows_ref[i] != prev)

    @pl.when(first)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # HIGHEST: TPU f32 dot_general defaults to ONE bf16 MXU pass (~2e-3
    # rel error) — too coarse even for an f32 Krylov operator. These are
    # tiny [BR, BC] blocks; the multi-pass cost is noise next to the HBM
    # traffic.
    y_ref[:] += jax.lax.dot_general(
        vals_ref[:],
        x_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def bsr_matmul_pallas(
    vals2d: jax.Array,  # [nb·BR, BC] f32 — blocks flattened along rows
    brows: jax.Array,  # [nb] i32 (sorted)
    bcols: jax.Array,  # [nb] i32
    nbr: int,
    nbc: int,
    n: int,
    br: int,
    bc: int,
    x: jax.Array,  # [N, M]
    interpret: bool = False,
) -> jax.Array:
    """y = A·x with the scalar-prefetch Mosaic kernel (f32 compute)."""
    interpret = interpret or jax.default_backend() == "cpu"
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    m = x.shape[1]
    mp = _round_up(max(m, 8), 8)
    nb = brows.shape[0]
    xp = jnp.zeros((nbc * bc, mp), jnp.float32).at[:n, :m].set(
        x.astype(jnp.float32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, brows, bcols: (i, 0)),
            pl.BlockSpec((bc, mp), lambda i, brows, bcols: (bcols[i], 0)),
        ],
        out_specs=pl.BlockSpec(
            (br, mp), lambda i, brows, bcols: (brows[i], 0)
        ),
    )
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _bsr_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nbr * br, mp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(brows, bcols, vals2d, xp)
    out = out[:n, :m]
    return out[:, 0] if squeeze else out


class BlockSparseAffineOperator:
    """A(t)·x applications with dense-block storage on a sparse block grid.

    Drop-in alternative to `morfem_tpu.ops.sparse.SparseAffineOperator`
    (same `matvec`/`apply_addend`/`diagonal`/`bind`/`bind_precise`
    surface, so `solve_point_iterative` and `general_sparse_solve` accept
    it): the three pencil addends share one union block pattern, so the
    per-point bind combines block VALUES elementwise and applies a single
    block-sparse product — MXU contractions instead of BCOO gathers.

    `inflation` = dense-block storage / union nnz: the price of blocking.
    Near-diagonal (RCM-ordered mesh) sparsity keeps it small; the
    matrix-free router (`truncated_band_via_rcm`) falls back to BCOO when
    it grows past its threshold.
    """

    def __init__(
        self,
        *operands,
        symmetrize: bool = True,
        block_rows: int = 32,
        block_cols: int = 128,
    ):
        import scipy.sparse as sp

        mats = [
            m if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
            for m in operands
        ]
        if any(np.iscomplexobj(m.data) for m in mats):
            raise ValueError(
                "BlockSparseAffineOperator stores real blocks; lift "
                "complex operators through the interleaved real embedding "
                "first (ops/complex_split.embed_sparse_interleaved — "
                "morfem() does this automatically)"
            )
        if symmetrize:
            mats = [(m + m.T) * 0.5 for m in mats]
        n = mats[0].shape[0]
        vals, brows, bcols, nbr, nbc = bsr_from_scipy(
            mats, n, block_rows, block_cols
        )
        self.n = n
        self.br, self.bc = block_rows, block_cols
        self.nbr, self.nbc = nbr, nbc
        self.brows = jnp.asarray(brows)
        self.bcols = jnp.asarray(bcols)
        self.vals_w = jnp.asarray(vals)  # [P, nb, BR, BC] working dtype
        nnz_union = int(sum(abs(m) for m in mats).nnz)
        self.inflation = vals[0].size / max(nnz_union, 1)
        self.diags = jnp.stack(
            [jnp.asarray(m.diagonal()) for m in mats]
        )  # [P, N]

    @property
    def n_addends(self) -> int:
        return self.vals_w.shape[0]

    def _combined(self, c: jax.Array) -> jax.Array:
        return jnp.tensordot(c, self.vals_w, axes=1)

    def bind(self, c: jax.Array):
        """f32 Pallas fast path, combined once — for Krylov inner loops."""
        nb = self.brows.shape[0]
        vals2d = (
            self._combined(c)
            .astype(jnp.float32)
            .reshape(nb * self.br, self.bc)
        )

        def mv(x):
            return bsr_matmul_pallas(
                vals2d, self.brows, self.bcols, self.nbr, self.nbc,
                self.n, self.br, self.bc, x,
            ).astype(x.dtype)

        return mv

    def bind_precise(self, c: jax.Array):
        """Working-dtype XLA path, combined once — residuals/refinement."""
        vals = self._combined(c)

        def mv(x):
            return bsr_matmul(
                vals, self.brows, self.bcols, self.nbr, self.nbc, self.n, x
            )

        return mv

    def matvec(self, c: jax.Array, x: jax.Array) -> jax.Array:
        """Working-dtype exact apply (the GMRES operator)."""
        return self.bind_precise(c)(x)

    def apply_addend(self, p: int, x: jax.Array) -> jax.Array:
        """A_p·x for one (pre-symmetrized) addend in working dtype."""
        return bsr_matmul(
            self.vals_w[p], self.brows, self.bcols, self.nbr, self.nbc,
            self.n, x,
        )

    def diagonal(self, c: jax.Array) -> jax.Array:
        return jnp.tensordot(c, self.diags, axes=1)


# jit-argument capable (buffers as parameters, not HLO constants) — see
# utils/pytreereg.py
register_operator_pytree(
    BlockSparseAffineOperator,
    ("brows", "bcols", "vals_w", "diags"),
    ("n", "br", "bc", "nbr", "nbc", "inflation"),
)
