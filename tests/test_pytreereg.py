"""Operators must cross jit boundaries as ARGUMENTS (pytrees).

Round-3 regression: jitted solves that merely CLOSED over a large-N
operator embedded its buffers as HLO constants, overflowing the axon
remote-compile request (HTTP 413 at N=9000). Every operator class is
pytree-registered (utils/pytreereg.py) so its buffers become jit
parameters instead; these tests pin the contract for all five classes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu.ops.block_sparse import BlockSparseAffineOperator
from morfem_tpu.ops.block_tridiag import truncated_band_via_rcm
from morfem_tpu.ops.ell import ELLAffineOperator
from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator
from morfem_tpu.ops.sparse import (
    GeneralSparseOperator,
    SparseAffineOperator,
)


def _pencil(n=96, seed=0):
    rng = np.random.default_rng(seed)
    a0 = sp.diags(
        [np.full(n - 2, -0.5), 4.0 + rng.random(n), np.full(n - 2, -0.5)],
        [-2, 0, 2],
    ).tocsr()
    a1 = sp.csr_matrix((n, n))
    a2 = (-sp.eye(n)).tocsr()
    return a0, a1, a2


@pytest.mark.parametrize(
    "make",
    [
        lambda a0, a1, a2: SparseAffineOperator(a0, a1, a2, symmetrize=True),
        lambda a0, a1, a2: BandedAffineOperator(a0, a1, a2),
        lambda a0, a1, a2: BlockSparseAffineOperator(
            a0, a1, a2, block_rows=8, block_cols=8
        ),
        lambda a0, a1, a2: ELLAffineOperator(a0, a1, a2),
    ],
    ids=["bcoo", "banded", "bsr", "ell"],
)
def test_operator_roundtrips_and_jits_as_argument(make):
    a0, a1, a2 = _pencil()
    op = make(a0, a1, a2)
    leaves, treedef = jax.tree_util.tree_flatten(op)
    assert leaves, "operator flattened to no array leaves"
    op2 = jax.tree_util.tree_unflatten(treedef, leaves)

    c = jnp.asarray([1.0, 0.0, -2.25])
    x = jnp.asarray(np.random.default_rng(1).standard_normal((96, 2)))
    y_ref = np.asarray(op.matvec(c, x))
    np.testing.assert_allclose(np.asarray(op2.matvec(c, x)), y_ref, rtol=1e-12)

    @jax.jit
    def apply(op, c, x):
        return op.matvec(c, x)

    np.testing.assert_allclose(
        np.asarray(apply(op, c, x)), y_ref, rtol=1e-5
    )


def test_general_sparse_operator_jits_as_argument():
    n = 128
    rng = np.random.default_rng(2)
    a0, a1, a2 = _pencil(n, seed=2)
    rows = np.arange(n)
    cols = rng.permutation(n)
    keep = np.abs(rows - cols) > 8
    far = sp.coo_matrix(
        (0.01 * rng.standard_normal(n)[keep], (rows[keep], cols[keep])),
        shape=(n, n),
    )
    a0 = (a0 + far + far.T).tocsr()
    exact_op, band_op, perm, dropped = truncated_band_via_rcm(
        a0, a1, a2, band_half=6
    )
    op = GeneralSparseOperator(exact_op, band_op, dropped=dropped)
    leaves, treedef = jax.tree_util.tree_flatten(op)
    assert leaves
    op2 = jax.tree_util.tree_unflatten(treedef, leaves)
    c = jnp.asarray([1.0, 0.0, -1.5])
    x = jnp.asarray(rng.standard_normal((n, 2)))
    np.testing.assert_allclose(
        np.asarray(op2.matvec(c, x)), np.asarray(op.matvec(c, x)), rtol=1e-12
    )

    @jax.jit
    def apply(op, c, x):
        return op.matvec(c, x)

    np.testing.assert_allclose(
        np.asarray(apply(op, c, x)),
        np.asarray(op.matvec(c, x)),
        rtol=1e-5,
    )
