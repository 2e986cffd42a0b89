"""Orthonormalization of snapshot bases.

The reference offers two strategies:

* thin SVD of the stacked snapshot matrix — the default greedy path
  re-SVDs the whole N×Nr basis every iteration
  (reference: implementation.py:226, :296-298, :210);
* classical Gram-Schmidt of new columns against the existing orthonormal
  base — the USE_OPM incremental path
  (reference: implementation.py:491-523).

Both are provided here, with TPU-appropriate twists:

* everything operates on *padded* bases: Q is stored as a fixed-shape
  [N, K] buffer with the first `ncols` columns active. Static shapes keep
  the whole greedy loop inside one compiled `lax.while_loop`.
* classical Gram-Schmidt is applied twice ("CGS2" / twice-is-enough),
  because single-pass CGS loses orthogonality at ~κ·ε while the reference
  gets away with it on its well-conditioned example. Each pass is two
  matmuls — MXU-friendly, no column-by-column Python loop
  (vs. reference implementation.py:500-506).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # TPU f64 matmuls degrade at default precision

from morfem_tpu.ops.precision import (  # noqa: E402
    precise_matmul,
    precise_matmul_chunked,
)


def column_mask(k: int, ncols: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[K] mask: 1.0 for columns < ncols, else 0.0."""
    return (jnp.arange(k) < ncols).astype(dtype)


def cholesky_qr_refine(q: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """One CholeskyQR pass: re-orthonormalize an almost-orthonormal basis.

    TPU's f64 QR/SVD lowering runs its internal matmuls at reduced
    precision for larger matrices — at N≈3.4k the returned factors are
    only ~3e-7 orthonormal (vs ~1e-13 at N≈512), which caps the accuracy
    of everything downstream. One pass of

        G = QᵀQ  (HIGHEST-precision matmul);  L = chol(G);  Q ← Q·L⁻ᵀ

    squares that error away (CholeskyQR2 argument: the result is
    orthonormal to ~ε·κ(Q)², and κ(Q) ≈ 1 + 3e-7 here). Padded (zero)
    columns are handled by a unit diagonal in G and stay exactly zero.
    No-ops gracefully (returns q unchanged) if G is numerically singular.
    """
    k = q.shape[1]
    g = precise_matmul(q.conj().T, q)
    if mask is not None:
        g = g + jnp.diag(1.0 - mask)
    l = jnp.linalg.cholesky(g)
    ok = jnp.all(jnp.isfinite(l))
    eye = jnp.eye(k, dtype=q.dtype)
    l_safe = jnp.where(ok, l, eye)
    # L⁻¹ via K×K triangular solve (small, accurate), applied with a
    # controlled-precision matmul
    linv = jax.scipy.linalg.solve_triangular(l_safe, eye, lower=True)
    q_ref = jnp.matmul(q, linv.conj().T, precision=_HI)
    return jnp.where(ok, q_ref, q)


def orthonormalize_svd(q: jax.Array) -> jax.Array:
    """Thin-SVD orthonormalization: left singular vectors of q.

    Counterpart of ``np.linalg.svd(q, full_matrices=False)[0]``
    (reference: implementation.py:210, :226, :298), followed by a
    CholeskyQR refinement pass (see `cholesky_qr_refine` — TPU's large-N
    SVD is only ~3e-7 orthonormal on its own).
    """
    u = jnp.linalg.svd(q, full_matrices=False)[0]
    return cholesky_qr_refine(u)


def orthonormalize_svd_masked(
    q: jax.Array, ncols: jax.Array
) -> jax.Array:
    """Thin-SVD orthonormalization of a padded basis.

    Zero (inactive) columns produce zero singular values, so the leading
    `ncols` left singular vectors span exactly the active columns' space.
    The result is re-masked so inactive columns are exactly zero again.
    """
    n, k = q.shape
    mask = column_mask(k, ncols, q.dtype)
    u = jnp.linalg.svd(q * mask, full_matrices=False)[0]
    if u.shape[1] < k:  # K > N: thin SVD returns [N, N]; restore padding
        u = jnp.pad(u, ((0, 0), (0, k - u.shape[1])))
    u = u * mask
    return cholesky_qr_refine(u, mask) * mask


def orthonormalize_append_cgs2(
    q: jax.Array,
    ncols: jax.Array,
    new: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Append `new` columns to a padded orthonormal basis via CGS2.

    Orthonormalizes each new column against the active base *and the
    previously appended new columns*, sequentially over the (few) new
    columns but with matmul-vectorized projections — the TPU analogue of the
    reference's `orthonormalize_to_base` (implementation.py:491-523), with a
    second projection pass for numerical robustness.

    Args:
      q: [N, K] padded orthonormal basis (active first `ncols` columns).
      ncols: current active column count (traced scalar).
      new: [N, M] new snapshot columns.

    Returns:
      (q_updated, ncols + M).
    """
    n, k = q.shape
    m = new.shape[1]

    def add_one(carry, j):
        q, nc = carry
        v = new[:, j]
        v0_norm = jnp.linalg.norm(v)
        mask = column_mask(k, nc, q.dtype)

        def project_out(v):
            # chunked emulated-f64, NOT the ozaki path: a [K,N]@[N] ozaki
            # instance costs ~8 s of XLA compile inside the greedy
            # while_loop vs ~1.4 s for the 2-matmul chunked product
            # (measured round 4: CGS2 compile 18.1 s -> 4.6 s), and the
            # chunked path is the same ~1e-15 accuracy class at these
            # contraction widths (partial sums stay in emulated f64).
            coeffs = precise_matmul_chunked(q.conj().T, v) * mask
            return v - jnp.matmul(q, coeffs, precision=_HI)

        v = project_out(project_out(v))
        norm = jnp.linalg.norm(v)
        # A (numerically) dependent column is SKIPPED — not written, and
        # nc does not advance. Counting it as active used to leave an
        # exactly-zero column under the ncols mask, which makes every
        # projected reduced system singular (NaN sweeps); observed when a
        # snapshot's columns are partially dependent on the basis, e.g.
        # basis saturation at ncols = N.
        safe = norm > jnp.maximum(
            1e-14 * v0_norm, jnp.asarray(jnp.finfo(norm.dtype).tiny, norm.dtype)
        )
        vq = jnp.where(safe, v / jnp.where(safe, norm, 1.0), jnp.zeros_like(v))
        q_new = q.at[:, nc].set(vq, mode="drop")
        q = jnp.where(safe, q_new, q)
        return (q, nc + safe.astype(nc.dtype)), None

    (q, nc), _ = jax.lax.scan(add_one, (q, ncols), jnp.arange(m))
    return q, nc
