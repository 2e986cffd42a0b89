"""ELL (padded row-slot) operators — gather-only sparsity for scattered
patterns.

The reference applies general sparsity through SciPy CSC on the host
(implementation.py:474-480, 526-528). On TPU this framework stores
unstructured operators as dense blocks (ops/block_sparse.py) when the
pattern blocks well; when it does NOT — rows of isolated couplings far
apart, where dense-block storage would inflate >32× — the previous
fallback was element-wise BCOO, whose matvec lowers to gather + SORTED
SCATTER-ADD (`segment_sum`). The scatter is the expensive half: TPU has
no scatter unit, so XLA serializes it through VMEM.

ELLPACK removes the scatter entirely. Every row stores exactly K slots
(K = max nonzeros/row over the UNION pattern of the three pencil
addends; short rows pad with zero values pointing at their own row):

    y[i] = Σ_k  vals[i, k] · x[cols[i, k]]

so the matvec is K row-gathers + fused multiply-accumulates over dense
[N, M] tiles — gather-only, no scatter, regular shapes. The transform is
memory-bound either way; ELL's win is that its HBM traffic is the
irreducible minimum (one pass over vals/cols, K passes over x) with no
sort/scatter on top. There is deliberately NO Pallas kernel here: the
kernel would be one gather per slot, exactly the program XLA already
emits — unlike BSR there is no MXU work to capture.

The price is the padding `inflation` = N·K / union-nnz: bounded row
degree (FEM, molecular graphs) keeps it small; a single dense-ish row
blows it up, in which case the router keeps BCOO. Shares the operator
surface of `SparseAffineOperator` / `BlockSparseAffineOperator`
(matvec/apply_addend/diagonal/bind/bind_precise), so
`solve_point_iterative` and `general_sparse_solve` accept it unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.utils.pytreereg import register_operator_pytree
from jax import lax

# One-shot gather ([N, K, M] intermediate) below this element count;
# above it, loop over slots to bound the intermediate at [N, M].
_ONE_SHOT_ELEMS = 1 << 27


def ell_from_scipy(mats, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack same-shape SciPy matrices into ELL slots on a SHARED pattern.

    The union pattern lets an affine pencil combine per-slot values
    elementwise (c0·v0 + c1·v1 + c2·v2) without touching the indices.
    Padding slots carry value 0 and point at their own row (a safe,
    cache-friendly gather target).

    Returns (vals [P, N, K], cols [N, K] i32), slots sorted by column
    within each row.
    """
    import scipy.sparse as sp

    union = sum(abs(m).tocsr() for m in mats)
    union.sum_duplicates()
    union.sort_indices()
    counts = np.diff(union.indptr)
    k = max(int(counts.max()) if counts.size else 0, 1)
    cols = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
    slot = np.concatenate([np.arange(c) for c in counts]) if union.nnz else (
        np.zeros(0, np.int64)
    )
    u_rows = np.repeat(np.arange(n), counts)
    cols[u_rows, slot] = union.indices
    # combined (row, col) keys are globally sorted in a canonical CSR, so
    # one searchsorted locates every addend entry's union slot at once
    u_key = u_rows.astype(np.int64) * n + union.indices
    vals = np.zeros((len(mats), n, k))
    for p, m in enumerate(mats):
        csr = m.tocsr()
        csr.sum_duplicates()
        csr.sort_indices()
        a_rows = np.repeat(np.arange(n), np.diff(csr.indptr))
        a_key = a_rows.astype(np.int64) * n + csr.indices
        pos = np.searchsorted(u_key, a_key)
        vals[p][a_rows, pos - union.indptr[a_rows]] = csr.data
    return vals, cols


def ell_matmul(
    vals: jax.Array,  # [N, K] combined slot values
    cols: jax.Array,  # [N, K] i32
    x: jax.Array,  # [N, M] or [N]
) -> jax.Array:
    """y = A·x, gather-only: K row-gathers of x + fused FMAs."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, k = vals.shape
    m = x.shape[1]
    vals = vals.astype(x.dtype)
    if n * k * m <= _ONE_SHOT_ELEMS:
        gathered = jnp.take(x, cols.reshape(-1), axis=0).reshape(n, k, m)
        y = jnp.einsum("nk,nkm->nm", vals, gathered)
    else:
        def body(j, acc):
            v = lax.dynamic_slice_in_dim(vals, j, 1, axis=1)  # [N, 1]
            c = lax.dynamic_slice_in_dim(cols, j, 1, axis=1)[:, 0]
            return acc + v * jnp.take(x, c, axis=0)

        y = lax.fori_loop(0, k, body, jnp.zeros((n, m), x.dtype))
    return y[:, 0] if squeeze else y


class ELLAffineOperator:
    """A(t)·x applications with padded row-slot (ELL) storage.

    Drop-in alternative to `SparseAffineOperator` (element-wise BCOO) for
    sparsity too scattered to block (`BlockSparseAffineOperator.inflation`
    past the router's threshold) but with bounded row degree: the three
    pencil addends share one union slot pattern, the per-point bind
    combines slot VALUES elementwise, and every apply is gather-only —
    no scatter/segment-sum anywhere.

    `inflation` = N·K / union-nnz is the padding price; the matrix-free
    router (`truncated_band_via_rcm`) keeps BCOO when a near-dense row
    makes it blow up.
    """

    def __init__(self, *operands, symmetrize: bool = True):
        import scipy.sparse as sp

        mats = [
            m if sp.issparse(m) else sp.csr_matrix(np.asarray(m))
            for m in operands
        ]
        if any(np.iscomplexobj(m.data) for m in mats):
            raise ValueError(
                "ELLAffineOperator stores real slots; lift complex "
                "operators through the interleaved real embedding first "
                "(ops/complex_split.embed_sparse_interleaved — morfem() "
                "does this automatically)"
            )
        if symmetrize:
            # (A+Aᵀ)/2 materialized at build time (host, nnz ≤ 2×): unlike
            # the BCOO operator there is no transposed-ELL apply, and the
            # symmetrized union pattern is what sets K anyway
            mats = [(m + m.T) * 0.5 for m in mats]
        n = mats[0].shape[0]
        vals, cols = ell_from_scipy(mats, n)
        self.n = n
        self.k = int(cols.shape[1])
        self.cols = jnp.asarray(cols)
        self.vals_w = jnp.asarray(vals)  # [P, N, K] working dtype
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
        """f32 fast path, slot values combined once — Krylov inner loops."""
        vals32 = self._combined(c).astype(jnp.float32)

        def mv(x):
            return ell_matmul(vals32, self.cols, x.astype(jnp.float32)).astype(
                x.dtype
            )

        return mv

    def bind_precise(self, c: jax.Array):
        """Working-dtype path, combined once — residuals/refinement."""
        vals = self._combined(c)

        def mv(x):
            return ell_matmul(vals, self.cols, x)

        return mv

    def matvec(self, c: jax.Array, x: jax.Array) -> jax.Array:
        """Working-dtype exact apply (the GMRES operator)."""
        return self.bind_precise(c)(x)

    def apply_addend(self, p: int, x: jax.Array) -> jax.Array:
        """A_p·x for one (pre-symmetrized) addend in working dtype."""
        return ell_matmul(self.vals_w[p], self.cols, x)

    def diagonal(self, c: jax.Array) -> jax.Array:
        return jnp.tensordot(c, self.diags, axes=1)


# jit-argument capable (buffers as parameters, not HLO constants) — see
# utils/pytreereg.py
register_operator_pytree(
    ELLAffineOperator,
    ("cols", "vals_w", "diags"),
    ("n", "k", "inflation"),
)
