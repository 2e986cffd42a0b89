"""On-chip route verification: BSR matfree, complex sparse (interleaved),
complex dense (embedded) — each driven through the PUBLIC morfem() API on
the real TPU and checked against host dense/complex oracles.

Complements tools/onchip_smoke.py (kernel-level) with route-level checks.
Run: python tools/drive_tpu_routes.py          (uses the default backend —
the tunneled TPU under axon; falls back to whatever jax.devices() gives).
Pass --cpu to pin the CPU backend (NOTE: the axon plugin ignores the
JAX_PLATFORMS env var — only jax.config.update("jax_platforms", ...)
works, same landmine the hermetic dryrun fixed).

Reference roles verified here:
- splu arbitrary-CSC parity (implementation.py:474-476) via the BSR /
  general-sparse matfree route at N past dense_cutoff.
- splu dtype genericity (complex systems, implementation.py:474-480) via
  the interleaved sparse embedding and the dense real 2N embedding.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
import scipy.sparse as sp

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# SciPy-parity working precision, like bench.py / tests/conftest.py —
# without it the f64 refinement runs in f32 and floors at ~5e-8
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from morfem_tpu.config import MorfemConfig
from morfem_tpu.mor.api import morfem


def _report(name, rel, tol):
    status = "OK" if rel < tol else "FAIL"
    print(f"{name}: rel err {rel:.2e} (tol {tol:.0e}) {status}")
    return rel < tol


def bsr_route(n=9000, seed=3):
    """Band + far couplings, indefinite — the general-sparsity route
    (truncated-band preconditioned GMRES over the BSR/BCOO operator)."""
    rng = np.random.default_rng(seed)
    main = 4.0 + rng.uniform(0, 0.5, n)
    t = sp.diags(
        [np.full(n - 1, -1.0), main, np.full(n - 1, -1.0)], [-1, 0, 1]
    ).tocsr()
    c_main = 8.0 + rng.uniform(0, 1.0, n)
    c = sp.diags(
        [np.full(n - 3, -0.7), c_main, np.full(n - 3, -0.7)], [-3, 0, 3]
    ).tocsr()
    rows = np.arange(n)
    cols = rng.permutation(n)
    keep = np.abs(rows - cols) > 8
    vals = 0.004 * rng.standard_normal(n)
    far = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])), shape=(n, n))
    c = (c + far + far.T).tocsr()
    a1 = sp.csr_matrix((n, n))
    a2 = -t
    b = rng.standard_normal((n, 2))
    # sweep BELOW the pencil spectrum (λ(C,T) ≳ 1.1 here): a random pencil
    # swept through its own spectrum has O(N) in-band resonances — an
    # irreducible manifold no MOR method compresses (the controlled-
    # spectrum lesson, utils/synthetic.py). The route, not reducibility,
    # is under test; indefinite solves are covered by
    # tests/test_general_sparse.py::test_general_solve_indefinite_to_1e8.
    domain = np.linspace(0.4, 0.8, 16)
    cfg = MorfemConfig(
        symmetrize=False,
        dense_cutoff=4096,
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.5,
    )
    t0 = time.perf_counter()
    x, q, *_ = morfem(domain, c, a1, a2, b, config=cfg)
    dt = time.perf_counter() - t0
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 8, 15):
        tt = domain[i]
        a_t = (c + tt**2 * a2).toarray()
        ref = np.linalg.solve(a_t, tt * b)
        worst = max(
            worst, float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref))
        )
    print(f"  (bsr route {dt:.1f}s, N={n})")
    return _report("BSR/general-sparse matfree route", worst, 1e-7)


def complex_sparse_route(n=2000, seed=7):
    """Complex sparse past dense_cutoff → interleaved real 2N embedding."""
    rng = np.random.default_rng(seed)
    half = 6
    offs = list(range(0, half + 1))
    diags = [(8.0 + rng.random(n)) + 1j * 0.4] + [
        (-0.3 + 0.05j) * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    domain = np.linspace(0.8, 2.0, 24)
    cfg = MorfemConfig(
        symmetrize=False,
        dense_cutoff=256,
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.5,
    )
    t0 = time.perf_counter()
    x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
    dt = time.perf_counter() - t0
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 12, 23):
        tt = domain[i]
        ref = np.linalg.solve(a0.toarray() - tt**2 * np.eye(n), tt * b)
        worst = max(
            worst, float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref))
        )
    print(f"  (complex sparse route {dt:.1f}s, N={n})")
    return _report("complex sparse (interleaved embedding) route", worst, 1e-7)


def complex_dense_route(n=768, seed=11):
    """Complex DENSE input on TPU → real 2N embedding auto-route."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, n))
    a0 = (w + w.T) + n * np.eye(n) + 1j * 0.3 * np.eye(n)
    a1 = np.zeros((n, n), dtype=complex)
    a2 = -np.eye(n, dtype=complex)
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    domain = np.linspace(0.5, 1.5, 20)
    cfg = MorfemConfig(
        symmetrize=False,
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.5,
    )
    t0 = time.perf_counter()
    x, q, *_ = morfem(domain, a0, a1, a2, b, config=cfg)
    dt = time.perf_counter() - t0
    rec = np.einsum("nk,ikm->inm", np.asarray(q), np.asarray(x))
    worst = 0.0
    for i in (0, 10, 19):
        tt = domain[i]
        ref = np.linalg.solve(a0 + tt**2 * a2, tt * b)
        worst = max(
            worst, float(np.linalg.norm(rec[i] - ref) / np.linalg.norm(ref))
        )
    print(f"  (complex dense route {dt:.1f}s, N={n})")
    return _report("complex dense (real 2N embedding) route", worst, 1e-7)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}")
    t0 = time.perf_counter()
    ok = True
    ok &= complex_dense_route()
    ok &= complex_sparse_route()
    ok &= bsr_route()
    dt = time.perf_counter() - t0
    if not ok:
        raise SystemExit(f"route drive FAILED ({dt:.0f}s)")
    print(f"route drive OK ({dt:.0f}s)")


if __name__ == "__main__":
    main()
