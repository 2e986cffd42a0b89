"""Large-N stress test — BASELINE config 3 (upscaled system).

Builds a `rate`×-larger waveguide system with the reference's
block-diagonal upscaler (`fake_interpolate` equivalent) and runs the MOR
pipeline on it, reporting the full-order-vs-reduced parity and timings.
With `--sparse` the snapshot solves go through the BCOO/BiCGStab
matrix-free path instead of dense LU — the route for N beyond dense-LU
reach.

Usage:
    python examples/large_n_sweep.py [--base-n 3411] [--rate 4] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-n", type=int, default=3411)
    p.add_argument("--rate", type=int, default=4)
    p.add_argument("--points", type=int, default=40)
    p.add_argument("--seeds", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sparse", action="store_true",
                   help="BCOO + BiCGStab snapshot solves")
    p.add_argument("--check-points", type=int, default=3,
                   help="full-order points to verify against (0 disables)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
        )
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from morfem_tpu import (
        AffineSystem,
        MorfemConfig,
        equally_distributed_basis,
        project,
        solve_point,
        sweep,
    )
    from morfem_tpu.apps.studies import upscale_block_diag
    from morfem_tpu.apps.waveguide import load_waveguide_data, waveguide_system
    from morfem_tpu.mor.equally import seed_indices

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    data = load_waveguide_data(
        n_fallback=args.base_n,
        cache_dir=os.path.join(repo_root, "data", "synthetic_cache"),
    )
    base = waveguide_system(np.linspace(3e9, 5e9, args.points), data)
    (a0, a1, a2), b = upscale_block_diag(
        [np.asarray(base.a0), np.asarray(base.a1), np.asarray(base.a2)],
        np.asarray(base.b),
        rate=args.rate,
    )
    n = a0.shape[0]
    print(f"upscaled system: N = {n} (= {args.base_n} × {args.rate})")
    sys_ = AffineSystem.create(
        base.domain, a0, a1, a2, b, t_b=base.t_b
    )
    # XLA's LuDecompositionBlock exceeds its 16 MB scoped-VMEM budget when
    # batching N ≳ 6k factorizations; solve one at a time beyond that
    cfg = MorfemConfig(solve_chunk=1 if n > 5000 else 2)

    t0 = time.perf_counter()
    if args.sparse:
        from morfem_tpu.mor.reduced import ReducedModel
        from morfem_tpu.ops.sparse import sparse_snapshot_basis, sparse_project
        import scipy.sparse as sp

        a0s = sp.csr_array(a0)
        a1s = sp.csr_array(a1)
        a2s = sp.csr_array(a2)
        sidx = jnp.asarray(seed_indices(args.points, cfg, count=args.seeds))
        coeffs = (sys_.t_a0, sys_.t_a1, sys_.t_a2, sys_.t_b)
        q = sparse_snapshot_basis(
            (a0s, a1s, a2s), jnp.asarray(b), sys_.domain, sidx, coeffs, cfg,
            tol=1e-10,
        )
        (r0, r1, r2), b_r = sparse_project((a0s, a1s, a2s), b, q)
        rm = ReducedModel(
            domain=sys_.domain, q=q, r0=r0, r1=r1, r2=r2, b_r=b_r,
            ncols=jnp.asarray(q.shape[1]),
            t_a0=sys_.t_a0, t_a1=sys_.t_a1, t_a2=sys_.t_a2, t_b=sys_.t_b,
        )
    else:
        q = equally_distributed_basis(sys_, cfg, count=args.seeds)
        rm = project(sys_, q)
    float(jnp.sum(rm.b_r))
    t_basis = time.perf_counter() - t0
    print(f"basis + projection ({args.seeds} seeds): {t_basis:.2f} s "
          f"(Nr = {rm.q.shape[1]})")

    t0 = time.perf_counter()
    x = sweep(rm, cfg)
    float(jnp.sum(x))
    t_sweep = time.perf_counter() - t0
    print(f"reduced sweep ({args.points} pts): {t_sweep*1e3:.1f} ms")

    if args.check_points:
        idx = np.linspace(1, args.points - 2, args.check_points).astype(int)
        errs = []
        for i in idx:
            xf = solve_point(sys_, sys_.domain[int(i)], cfg)
            rec = jnp.asarray(rm.q) @ x[int(i)]
            errs.append(
                float(jnp.linalg.norm(rec - xf) / jnp.linalg.norm(xf))
            )
        print(f"rel error vs full-order at {args.check_points} check points: "
              f"max {max(errs):.2e}")
    print("Done")


if __name__ == "__main__":
    main()
