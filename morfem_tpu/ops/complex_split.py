"""Complex-operator systems on TPU via the real 2N×2N embedding.

The reference handles complex systems transparently through NumPy/SciPy
(reference: implementation.py:468-480 — `splu`/`lu_factor` accept complex).
On TPU the situation is different: complex64 LU exists but caps accuracy at
single precision, and complex128 does not exist on the device at all —
so a complex *operator* cannot even be transferred under x64 mode.

The TPU-native answer is the standard real embedding. For
``A = Ar + i·Ai`` and ``b = br + i·bi``,

    A·x = b   ⇔   K·[xr; xi] = [br; bi],   K = [[Ar, -Ai], [Ai, Ar]]

K is real, so the whole mixed-precision machinery applies unchanged: f32
MXU factorization of the 2N×2N embedding + chunked-f64 adaptive iterative
refinement (`ops/solve.py`) reaches ~1e-15 relative residuals — far past
anything complex64 arithmetic could deliver. Cost: (2N)³ real-LU flop is
~2.7× the real-flop cost of a complex N×N LU; on the MXU that trade is
easily worth full f64-grade accuracy.

Two levels of API:

* `solve_complex_split` — one-shot dense solve from split re/im parts.
* `embed_affine_system` — lift a whole complex affine system to a real
  `AffineSystem` of size 2N so EVERY downstream component (greedy loop,
  error estimator, Galerkin projection, batched reduced sweeps, Pallas
  kernels, sharded paths) runs on TPU unchanged; `split_solution`
  reassembles complex solutions.

CAVEATS (enforced where cheap, documented otherwise):

* Coefficient callables must be REAL-valued on the domain. A complex
  coefficient would mix the re/im blocks differently per addend; lift it
  into the operator instead (A_p ← c·A_p with a real coefficient).
* The embedding K is NOT symmetric whenever Ai ≠ 0 (even for
  complex-symmetric A), so run with ``config.symmetrize=False`` —
  `embed_affine_system` raises if asked to keep symmetrization on.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.system import AffineSystem


def _as_host_dense(a) -> np.ndarray:
    """Densify to a HOST NumPy array — complex inputs must never touch the
    device (complex128 does not exist on TPU; even the transfer hangs the
    axon backend)."""
    if hasattr(a, "todense"):  # SciPy sparse
        a = a.todense()
    return np.asarray(a)


def real_embedding(a_re: jax.Array, a_im: jax.Array) -> jax.Array:
    """[[Ar, -Ai], [Ai, Ar]] — the real 2N×2N image of Ar + i·Ai.

    Supports leading batch axes.
    """
    top = jnp.concatenate([a_re, -a_im], axis=-1)
    bot = jnp.concatenate([a_im, a_re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def embed_rhs(b_re: jax.Array, b_im: jax.Array) -> jax.Array:
    """[br; bi] — stack real/imag parts along the row (N) axis."""
    return jnp.concatenate([b_re, b_im], axis=-2)


def split_solution(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Split an embedded [..., 2N, M] solution into (x_re, x_im)."""
    n = x.shape[-2] // 2
    return x[..., :n, :], x[..., n:, :]


def solve_complex_split(
    a_re: jax.Array,
    a_im: jax.Array,
    b_re: jax.Array,
    b_im: jax.Array,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> Tuple[jax.Array, jax.Array]:
    """Solve (Ar + i·Ai)·x = (br + i·bi) in pure real arithmetic.

    All inputs are real arrays (typically float64); the solve runs through
    `ops/solve.py::solve_dense` on the 2N×2N embedding — f32 MXU LU plus
    adaptive f64 refinement — and therefore compiles and reaches ~1e-15
    relative residuals on TPU, where a native complex128 solve cannot run
    at all. Returns ``(x_re, x_im)``, each [..., N, M].
    """
    from morfem_tpu.ops.solve import solve_dense

    k = real_embedding(a_re, a_im)
    rhs = embed_rhs(b_re, b_im)
    x = solve_dense(k, rhs, config)
    return split_solution(x)


def solve_complex(
    a,
    b,
    config: MorfemConfig = DEFAULT_CONFIG,
):
    """Host-level convenience: complex ndarray in, complex ndarray out.

    Splits the complex inputs on the host (so a complex128 array never has
    to reach the TPU) and reassembles the complex solution. ``a`` may be a
    NumPy/JAX array or SciPy sparse matrix.
    """
    a = _as_host_dense(a)
    b = _as_host_dense(b)
    work = np.zeros((), np.result_type(a.dtype, b.dtype)).real.dtype
    x_re, x_im = solve_complex_split(
        jnp.asarray(a.real.astype(work)),
        jnp.asarray(a.imag.astype(work)),
        jnp.asarray(b.real.astype(work)),
        jnp.asarray(b.imag.astype(work)),
        config,
    )
    return np.asarray(x_re) + 1j * np.asarray(x_im)


def embed_affine_system(
    domain,
    a0,
    a1,
    a2,
    b,
    t_a0: Callable | None = None,
    t_a1: Callable | None = None,
    t_a2: Callable | None = None,
    t_b: Callable | None = None,
    config: MorfemConfig = DEFAULT_CONFIG,
) -> AffineSystem:
    """Lift a complex affine system to a real 2N-DOF `AffineSystem`.

    Because the embedding commutes with REAL linear combinations,
    ``K(t) = Σ t_p(t)·K_p`` equals the embedding of ``A(t)`` whenever the
    coefficients are real on the domain — so the greedy loop, estimator,
    projection, and sweeps all operate on the genuine complex problem.
    Recover complex solutions with `split_solution` (sweeps return
    [..., 2N, M]) and complex basis vectors as ``q[:N] + i·q[N:]``.

    Raises if ``config.symmetrize`` is on while any operator has a nonzero
    imaginary part: the embedding of a complex matrix is never symmetric,
    and `(K + Kᵀ)/2` would silently solve a different problem.
    """
    # Split ON THE HOST: complex128 arrays must never be device-put (the
    # dtype doesn't exist on TPU; the transfer itself hangs the backend).
    arrs = [_as_host_dense(x) for x in (a0, a1, a2, b)]
    work = np.zeros(
        (), np.result_type(*(x.dtype for x in arrs))
    ).real.dtype
    any_imag = any(
        np.iscomplexobj(x) and bool(np.any(x.imag != 0)) for x in arrs
    )
    if any_imag and config.symmetrize:
        raise ValueError(
            "embed_affine_system: the real embedding of a complex operator "
            "is non-symmetric; run with config.symmetrize=False (the "
            "(A+Aᵀ)/2 step would change the problem)"
        )
    a0e, a1e, a2e = (
        real_embedding(
            jnp.asarray(x.real.astype(work)),
            jnp.asarray(x.imag.astype(work)),
        )
        for x in arrs[:3]
    )
    be = embed_rhs(
        jnp.asarray(arrs[3].real.astype(work)),
        jnp.asarray(arrs[3].imag.astype(work)),
    )
    kwargs = {}
    for name, fn in (
        ("t_a0", t_a0), ("t_a1", t_a1), ("t_a2", t_a2), ("t_b", t_b)
    ):
        if fn is not None:
            kwargs[name] = fn
    return AffineSystem.create(domain, a0e, a1e, a2e, be, **kwargs)


def eval_coefficient_table(domain, fn) -> np.ndarray:
    """Evaluate a coefficient callable over the whole domain ON THE HOST.

    Complex-valued callables (t_b(t)=e^{iωt} and friends) cannot be traced
    into TPU programs — complex128 does not exist on the device — so the
    complex-coefficient route evaluates them ONCE here, on the CPU backend
    (which has full complex128), and carries exact per-point tables
    instead. Accepts callables written with numpy or jax.numpy.
    """
    dom = np.asarray(domain)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            vals = np.asarray(fn(jnp.asarray(dom)))
    except Exception:
        vals = np.asarray(fn(dom))
    return np.broadcast_to(vals, dom.shape).copy()


def grid_lookup_coefficient(domain, table):
    """EXACT grid-point coefficient callable from a per-point table.

    Returns a JAX-traceable, TPU-safe (real-only) callable t ↦ table[i(t)]
    with i(t) = searchsorted(domain, t): exact whenever t is one of the
    domain's grid points — which is every evaluation the BUILD pipeline
    makes (snapshots, estimator, sweeps all run on the domain grid). For
    off-grid t it snaps to the right neighbour — which is fine, because
    these lookups never leave the build: the complex routes RETURN a
    grid-generic complex reduced model
    (`mor/complex_model.py::finish_complex_model`), and off-grid
    re-sweeps go through `sweep_complex_reduced` with the caller's own
    callables.
    """
    dom = jnp.asarray(np.asarray(domain))
    tab = jnp.asarray(np.asarray(table))

    def fn(t):
        idx = jnp.clip(
            jnp.searchsorted(dom, jnp.asarray(t)), 0, dom.shape[0] - 1
        )
        return tab[idx]

    return fn


def embed_sparse_interleaved(a):
    """Sparse real 2N image of a complex SPARSE matrix, INTERLEAVED.

    Each complex entry a_ij becomes the 2×2 rotation block
    [[Re, −Im], [Im, Re]] at rows (2i, 2i+1) × cols (2j, 2j+1):

        E = Re(A) ⊗ I₂ + Im(A) ⊗ [[0, −1], [1, 0]]

    Unlike the stacked [[Ar, −Ai], [Ai, Ar]] layout (whose bandwidth is
    ~N regardless of A's), interleaving PRESERVES band structure — a
    half-bandwidth-h complex matrix embeds with half-bandwidth 2h+1 — so
    the RCM-banded direct path and the truncated-band preconditioner
    keep working at 2N. nnz grows to ≤ 4× (2× when A is real- or
    imaginary-only per entry); no densification ever happens.
    """
    import scipy.sparse as sp

    a = a.tocsr() if sp.issparse(a) else sp.csr_matrix(np.asarray(a))
    eye2 = sp.csr_matrix(np.array([[1.0, 0.0], [0.0, 1.0]]))
    rot2 = sp.csr_matrix(np.array([[0.0, -1.0], [1.0, 0.0]]))
    re = sp.csr_matrix(
        (np.real(a.data), a.indices, a.indptr), shape=a.shape
    )
    e = sp.kron(re, eye2, format="csr")
    if np.iscomplexobj(a.data) and np.any(a.data.imag != 0):
        im = sp.csr_matrix(
            (np.imag(a.data), a.indices, a.indptr), shape=a.shape
        )
        e = (e + sp.kron(im, rot2, format="csr")).tocsr()
    return e


def embed_rhs_interleaved(b) -> np.ndarray:
    """[N, M] complex → [2N, M] real with rows (2i, 2i+1) = (Re, Im)."""
    b = np.asarray(b.todense()) if hasattr(b, "todense") else np.asarray(b)
    if b.ndim == 1:
        b = b[:, None]
    out = np.empty((2 * b.shape[0], b.shape[1]), b.real.dtype)
    out[0::2] = b.real
    out[1::2] = b.imag
    return out


def deinterleave(x):
    """[..., 2N, M] real (interleaved) → [..., N, M] complex."""
    return x[..., 0::2, :] + 1j * x[..., 1::2, :]
