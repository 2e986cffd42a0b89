"""On-chip smoke test for the Mosaic/Pallas kernels — seconds, not minutes.

The unit tests exercise every Pallas kernel in INTERPRET mode on CPU
(fine for CI, blind to Mosaic miscompiles); bench.py asserts on-chip
accuracy but costs minutes of compile. This script is the middle layer
the round-2 review asked for (item #8): drive each kernel ON THE CHIP at
small shapes with hard accuracy asserts, so a Mosaic regression is caught
by one quick command:

    python tools/onchip_smoke.py        # exits 0, prints one OK per kernel

Covered:
  * ops/pallas/reduced_sweep.py  — fused assemble+Gauss-Jordan sweep
  * ops/pallas/panel_factor.py   — panel LU kernel via a full
    factor+refined-solve round trip (ops/panel_lu.py)
  * ops/pallas/banded_matvec.py  — banded matvec via block_tridiag's
    banded direct solve
  * ops/block_sparse.py          — BSR scalar-prefetch kernel vs the
    XLA block path and a dense oracle
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
try:
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def check(name: str, err: float, tol: float) -> None:
    status = "OK" if err < tol else "FAIL"
    print(f"{name}: rel err {err:.2e} (tol {tol:.0e}) {status}")
    if err >= tol:
        raise SystemExit(f"on-chip smoke FAILED: {name}")


def main() -> None:
    t_start = time.time()
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # --- fused reduced-sweep kernel vs dense LU oracle ---
    from morfem_tpu.ops.pallas.reduced_sweep import gauss_jordan_sweep_solve

    k, i_pts, m = 24, 40, 2
    r0 = rng.standard_normal((k, k)) + 6 * np.eye(k)
    r1 = rng.standard_normal((k, k)) * 0.1
    r2 = rng.standard_normal((k, k)) * 0.1
    c = np.stack([np.ones(i_pts), np.linspace(1, 2, i_pts),
                  np.linspace(1, 2, i_pts) ** 2], axis=1)
    rhs = rng.standard_normal((i_pts, k, m))
    x = np.asarray(
        gauss_jordan_sweep_solve(
            jnp.asarray(r0), jnp.asarray(r1), jnp.asarray(r2),
            jnp.asarray(c), jnp.asarray(rhs), jnp.zeros(k),
            symmetrize=True,
        ),
        np.float64,
    )
    a_all = np.einsum("ip,pkl->ikl", c,
                      np.stack([(r0 + r0.T) / 2, (r1 + r1.T) / 2,
                                (r2 + r2.T) / 2]))
    x_ref = np.linalg.solve(a_all, rhs)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    check("reduced_sweep GJ kernel (f32)", err, 1e-4)

    # --- fused multi-word GEMM kernel vs the XLA 6-pass scheme ---
    from morfem_tpu.ops.pallas.fused_mm import mm_words
    from morfem_tpu.ops.precision import matmul_f32_accurate

    gf, mf, kf, nf = 2, 256, 128, 384
    cf = jnp.asarray(rng.standard_normal((gf, mf, kf)), jnp.float32)
    rf = jnp.asarray(rng.standard_normal((gf, kf, nf)), jnp.float32)
    tf = jnp.asarray(rng.standard_normal((gf, mf, nf)), jnp.float32)
    got = np.asarray(mm_words(cf, rf, tf, sign=-1), np.float64)
    want = np.asarray(tf, np.float64) - np.einsum(
        "gmk,gkn->gmn", np.asarray(cf, np.float64),
        np.asarray(rf, np.float64),
    )
    err = np.abs(got - want).max() / np.abs(want).max()
    check("fused mm_words kernel (f32-true)", err, 5e-6)

    # --- DMA row-gather kernel: compiled Mosaic lowering vs take ---
    # (interpret-mode unit tests cannot catch tiled-HBM alignment or
    # scalar-prefetch lowering regressions — ADVICE r4)
    from morfem_tpu.ops.pallas.row_gather import gather_rows

    gg, ng, wg, pg = 2, 512, 384, 256
    srcg = jnp.asarray(rng.standard_normal((gg, ng, wg)), jnp.float32)
    idxg = rng.integers(0, ng, size=(gg, pg))
    idxg[:, :16] = idxg[:, 100:116]  # duplicates
    idxg = jnp.asarray(idxg, jnp.int32)
    outg = np.asarray(gather_rows(srcg, idxg))
    refg = np.take_along_axis(
        np.asarray(srcg), np.asarray(idxg)[:, :, None], axis=1
    )
    err = float(np.abs(outg - refg).max())
    check("row-gather DMA kernel (exactness)", err + 1e-300, 1e-30)

    # --- panel LU kernel: factor + refined solve round trip ---
    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.ops.panel_lu import solve_batch_panel

    n, g = 384, 2
    a = rng.standard_normal((g, n, n))
    a[0, 0, 0] = 0.0  # force a pivot exchange
    b = rng.standard_normal((g, n, 2))
    x = np.asarray(
        solve_batch_panel(jnp.asarray(a), jnp.asarray(b),
                          MorfemConfig(refine_iterations=8))
    )
    err = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    check("panel LU factor+refine", err, 1e-11)

    # --- banded direct solve (banded matvec kernel + block-Thomas) ---
    import scipy.sparse as sp

    from morfem_tpu.ops.block_tridiag import rcm_direct_solve

    nb = 1024
    half = 6
    diags = {0: 8.0 + rng.standard_normal(nb)}
    for d in range(1, half + 1):
        v = rng.standard_normal(nb - d) * 0.5
        diags[d] = v
        diags[-d] = v
    a0 = sp.diags([diags[d] for d in range(-half, half + 1)],
                  list(range(-half, half + 1)), format="csr")
    a1 = sp.identity(nb, format="csr") * 0.1
    a2 = sp.identity(nb, format="csr") * 0.05
    cvec = jnp.asarray([1.0, 0.5, 0.25])
    rhs = rng.standard_normal((nb, 2))
    x, relres, iters = rcm_direct_solve(a0, a1, a2, cvec, jnp.asarray(rhs))
    a_dense = (a0 + 0.5 * a1 + 0.25 * a2).toarray()
    a_dense = (a_dense + a_dense.T) / 2
    err = np.linalg.norm(a_dense @ np.asarray(x) - rhs) / np.linalg.norm(rhs)
    check("banded direct (block-Thomas + matvec kernel)", err, 1e-11)

    # --- block-sparse (BSR) kernel vs dense oracle ---
    from morfem_tpu.ops.block_sparse import BlockSparseAffineOperator

    ns = 700
    offs2 = list(range(0, 9))
    d2 = [6.0 + rng.random(ns)] + [
        -0.2 * np.ones(ns - d) for d in offs2[1:]
    ]
    s0 = sp.diags(d2, offs2).tocsr()
    s0 = (s0 + s0.T) * 0.5
    far = sp.coo_matrix(
        (0.05 * rng.standard_normal(80),
         (rng.integers(0, ns, 80), rng.integers(0, ns, 80))),
        shape=(ns, ns),
    )
    s0 = (s0 + far + far.T).tocsr()
    s1 = sp.csr_matrix((ns, ns))
    s2 = sp.eye(ns).tocsr()
    op = BlockSparseAffineOperator(s0, s1, s2, symmetrize=False)
    cb = jnp.asarray([1.0, 0.0, -1.5])
    xv = jnp.asarray(rng.standard_normal((ns, 2)))
    dense = s0.toarray() - 1.5 * np.eye(ns)
    ref = dense @ np.asarray(xv)
    y_xla = np.asarray(op.bind_precise(cb)(xv))
    err = np.linalg.norm(y_xla - ref) / np.linalg.norm(ref)
    check("block-sparse XLA path (f64)", err, 1e-12)
    y_pal = np.asarray(op.bind(cb)(xv))
    err = np.linalg.norm(y_pal - ref) / np.linalg.norm(ref)
    check("block-sparse Pallas kernel (f32)", err, 1e-5)

    print(f"on-chip smoke OK ({time.time() - t_start:.0f}s)")


if __name__ == "__main__":
    main()
