"""General-sparsity MOR — the arbitrary-`splu` parity route, end to end.

Builds an indefinite Helmholtz-like pencil whose sparsity no ordering can
band-recover (a FEM band PLUS random long-range couplings), hands the
SciPy matrices straight to `morfem()`, and checks the reduced sweep
against dense full-order oracles. Routing (all automatic):

  N > config.dense_cutoff with SciPy-sparse inputs
    → matrix-free (`mor/api.py`), RCM tried first
    → bandwidth rejection → truncated-band route:
        exact applies   : dense-block BSR on the MXU (ops/block_sparse;
                          element-wise BCOO fallback when blocking is
                          wasteful),
        snapshot solves : exact-operator GMRES preconditioned by the
                          shifted block-direct factorization of the
                          in-band part (ops/block_tridiag).

Reference role: `splu` accepts arbitrary CSC (implementation.py:474-476);
this is the TPU-native equivalent for patterns outside the banded direct
path's reach.

Usage:
    python examples/general_sparse_mor.py [--n 9000] [--points 40] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=9000)
    p.add_argument("--points", type=int, default=40)
    p.add_argument("--half", type=int, default=14,
                   help="FEM band half-width of the synthetic pencil")
    p.add_argument("--far", type=int, default=400,
                   help="number of long-range couplings")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--check-points", type=int, default=3)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    import morfem_tpu as mt

    rng = np.random.default_rng(11)
    n = args.n
    offs = list(range(0, args.half + 1))
    diags = [6.0 + rng.random(n)] + [
        -0.15 * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5
    far = sp.coo_matrix(
        (
            0.03 * rng.standard_normal(args.far),
            (rng.integers(0, n, args.far), rng.integers(0, n, args.far)),
        ),
        shape=(n, n),
    )
    a0 = (a0 + far + far.T).tocsr()  # long-range: not band-recoverable
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()  # A(t) = A0 − t²·I — indefinite in-band
    b = rng.standard_normal((n, 2))
    domain = np.linspace(0.5, 2.2, args.points)

    cfg = mt.MorfemConfig(
        band_max_half=64,  # preconditioner band (keeps dropped mass tiny)
        dense_cutoff=4000,  # force the matrix-free route at this N
        use_equally_distributed=True,
        equally_distributed_reduction_rate=0.75,
    )
    print(f"N={n} nnz={a0.nnz + a2.nnz} I={args.points} "
          f"device={jax.devices()[0]}")

    t0 = time.perf_counter()
    x_r, q, *_ = mt.morfem(domain, a0, a1, a2, b, config=cfg)
    x = jnp.einsum("nk,ikm->inm", q, x_r)
    print(f"morfem (matrix-free, general sparsity): "
          f"{time.perf_counter() - t0:.1f} s, basis Nr={q.shape[1]}")

    if args.check_points:
        idx = np.linspace(0, args.points - 1, args.check_points, dtype=int)
        worst = 0.0
        for i in idx:
            t = domain[i]
            dense = a0.toarray() - t**2 * np.eye(n)
            ref = np.linalg.solve(dense, t * b)
            rel = float(
                np.linalg.norm(np.asarray(x[i]) - ref) / np.linalg.norm(ref)
            )
            worst = max(worst, rel)
            print(f"  t={t:.3f}: rel error vs dense oracle {rel:.2e}")
        assert worst < 1e-6, worst
        print(f"OK — worst rel error {worst:.2e}")


if __name__ == "__main__":
    main()
