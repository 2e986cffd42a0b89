"""General (non-band-recoverable) sparsity: truncated-band preconditioned
GMRES — the last `splu` parity gap (VERDICT r2 #4).

Reference role: implementation.py:474-476 (splu accepts arbitrary CSC).
Oracle: scipy.sparse.linalg.spsolve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from morfem_tpu.config import MorfemConfig
from morfem_tpu.ops.block_tridiag import (
    BandwidthError,
    banded_via_rcm,
    general_sparse_solve,
    truncated_band_via_rcm,
)


def _longrange_indefinite(n=640, half=3, seed=0):
    """Banded indefinite Helmholtz-like pencil + long-range couplings.

    The i ↔ i+n/2 edges make the adjacency graph circulant-like, so no
    reordering recovers a small bandwidth — exactly the case the banded
    direct path rejects.
    """
    rng = np.random.default_rng(seed)
    main = 4.0 + rng.uniform(0, 0.5, n)
    t = sp.diags(
        [np.full(n - 1, -1.0), main, np.full(n - 1, -1.0)],
        [-1, 0, 1],
    ).tocsr()
    c_main = 8.0 + rng.uniform(0, 1.0, n)
    c = sp.diags(
        [np.full(n - half, -0.7), c_main, np.full(n - half, -0.7)],
        [-half, 0, half],
    ).tocsr()
    # small long-range couplings along a random permutation (an expander-
    # like graph: no ordering makes it banded)
    rows = np.arange(n)
    cols = rng.permutation(n)
    keep = np.abs(rows - cols) > 8
    vals = 0.004 * rng.standard_normal(n)
    far = sp.coo_matrix(
        (vals[keep], (rows[keep], cols[keep])), shape=(n, n)
    )
    c = (c + far + far.T).tocsr()
    a1 = sp.csr_matrix((n, n))
    return c, a1, -t  # pencil C − k²·T (indefinite for k² in spectrum)


def test_rcm_rejects_longrange_pattern():
    c, a1, a2 = _longrange_indefinite()
    with pytest.raises(BandwidthError):
        banded_via_rcm(c, a1, a2, max_half=64)


def test_truncated_band_reports_dropped_mass():
    c, a1, a2 = _longrange_indefinite()
    exact_op, band_op, perm, dropped = truncated_band_via_rcm(
        c, a1, a2, band_half=64
    )
    assert 0.0 < dropped < 0.2  # long-range mass is minor but nonzero
    assert band_op.half <= 64


def test_general_solve_indefinite_to_1e8():
    c, a1, a2 = _longrange_indefinite()
    n = c.shape[0]
    # k² chosen INSIDE the spectrum of the pencil → indefinite system
    csym = ((c + c.T) * 0.5).toarray()
    tsym = ((-(a2 + a2.T)) * 0.5).toarray()
    eigs = np.sort(
        np.real(
            np.linalg.eigvals(np.linalg.solve(tsym, csym))
        )
    )
    k2 = 0.5 * (eigs[n // 3] + eigs[n // 3 + 1])  # between two eigenvalues
    a_full = csym - k2 * tsym
    assert np.any(np.linalg.eigvalsh(a_full) < 0)  # genuinely indefinite
    assert np.any(np.linalg.eigvalsh(a_full) > 0)

    exact_op, band_op, perm, dropped = truncated_band_via_rcm(
        c, a1, a2, band_half=64
    )
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((n, 2))
    cvec = jnp.asarray([1.0, 0.0, k2])
    p = np.asarray(perm)
    x_p, relres = general_sparse_solve(
        exact_op, band_op, cvec, jnp.asarray(rhs[p]), tol=1e-10, maxiter=120
    )
    assert float(jnp.max(relres)) < 1e-8
    x = np.zeros_like(np.asarray(x_p))
    x[p] = np.asarray(x_p)
    x_ref = np.linalg.solve(a_full, rhs)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-7


def test_morfem_routes_general_sparse_end_to_end():
    """morfem() on a large-ish sparse input with non-band-recoverable
    sparsity: the matrix-free path takes the GeneralSparseOperator route
    and matches the dense oracle."""
    import morfem_tpu as mt

    c, a1, a2 = _longrange_indefinite(n=320)
    n = c.shape[0]
    rng = np.random.default_rng(5)
    b = np.zeros((n, 2))
    b[rng.choice(n, 8, replace=False), 0] = 1.0
    b[rng.choice(n, 8, replace=False), 1] = 1.0
    # sweep BELOW the pencil spectrum: this test checks the general-sparse
    # ROUTING end to end; a random pencil swept through its own spectrum
    # has O(N) in-band resonances — an irreducible manifold no MOR method
    # compresses (the controlled-spectrum lesson, utils/synthetic.py) —
    # so indefinite in-band solves are covered by the dedicated test above
    domain = np.linspace(0.4, 0.8, 12)
    cfg = MorfemConfig(
        dense_cutoff=64,  # force the matrix-free route at this tiny N
        band_max_half=48,  # force the general (truncated-band) branch
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.5,
    )
    x, q, r0, r1, r2, b_r = mt.morfem(
        domain, c, a1, a2, b, config=cfg
    )
    sys_ = mt.AffineSystem.create(
        domain, c.toarray(), a1.toarray(), a2.toarray(), b
    )
    x_full = mt.solve_sweep(sys_, mt.MorfemConfig())
    rec = jnp.einsum("nk,ikm->inm", q, x)
    rel = float(jnp.linalg.norm(rec - x_full) / jnp.linalg.norm(x_full))
    assert rel < 1e-6


def test_greedy_matfree_over_general_sparse_operator():
    """The GREEDY strategy on the general-sparse route: snapshot solves
    dispatch through solve_point_iterative(method='auto') to the
    shifted-preconditioned GMRES, estimator applies through the
    (block-sparse or BCOO) exact operator."""
    import morfem_tpu as mt

    c, a1, a2 = _longrange_indefinite(n=320)
    n = c.shape[0]
    rng = np.random.default_rng(6)
    b = np.zeros((n, 2))
    b[rng.choice(n, 8, replace=False), 0] = 1.0
    b[rng.choice(n, 8, replace=False), 1] = 1.0
    domain = np.linspace(0.4, 0.8, 12)
    cfg = MorfemConfig(
        dense_cutoff=64,
        band_max_half=48,
        error_threshold=1e-11,
    )
    x, q, *_ = mt.morfem(domain, c, a1, a2, b, config=cfg)
    sys_ = mt.AffineSystem.create(
        domain, c.toarray(), a1.toarray(), a2.toarray(), b
    )
    x_full = mt.solve_sweep(sys_, mt.MorfemConfig())
    rec = jnp.einsum("nk,ikm->inm", q, x)
    rel = float(jnp.linalg.norm(rec - x_full) / jnp.linalg.norm(x_full))
    assert rel < 1e-6
