"""Large-N indefinite Helmholtz: banded DIRECT solves + matrix-free greedy.

The reference's large-N stress case is the block-diagonal upscale of the
waveguide solved point-by-point with `splu`
(fake_interpolate_bigger_sample.py + implementation.py:474-476). This
example drives the TPU-native equivalent end-to-end at banded scale:

  * `banded_waveguide_system` — a 1-D FEM Helmholtz pencil whose in-band
    systems C − k²T are strongly INDEFINITE (the regime where
    Jacobi-Krylov stagnates),
  * `BandedAffineOperator` — Pallas banded matvec operator,
  * `greedy_basis_matfree` — the reference's default (greedy) strategy
    with block-tridiagonal direct snapshot solves
    (ops/block_tridiag.py), escalating automatically to shifted-GMRES at
    near-resonance points,
  * reduced sweep + oracle check at a few dense points (when N permits).

Usage:
    python examples/banded_direct_greedy.py [--n 8192] [--points 60]
        [--length-m 1.0] [--cpu] [--check-points 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8192)
    p.add_argument("--points", type=int, default=60)
    p.add_argument("--length-m", type=float, default=1.0,
                   help="domain length; in-band resonance count ≈ 13·L")
    p.add_argument("--half", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--check-points", type=int, default=3,
                   help="dense-oracle check points (0 disables; needs "
                        "n small enough to densify)")
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

    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
    from morfem_tpu.mor.reduced import sweep
    from morfem_tpu.ops.pallas.banded_matvec import BandedAffineOperator
    from morfem_tpu.utils.synthetic import banded_waveguide_system

    print(f"building banded system: N={args.n}, half={args.half}, "
          f"L={args.length_m} m")
    c, t, wp = banded_waveguide_system(
        args.n, m=2, half=args.half, seed=5, length_m=args.length_m
    )
    gamma = (t * GAMMA_SCALE).tocsr()
    op = BandedAffineOperator(c, 0.0 * c, gamma, symmetrize=True)
    b = jnp.asarray(wp)
    domain = jnp.linspace(3e9, 5e9, args.points, dtype=jnp.float64)
    # threshold is the reference's ABSOLUTE squared residual
    # (implementation.py:424): 1e3 ≈ a 4e-9 relative residual at
    # ‖rhs‖ ≈ f·‖wp‖ ≈ 8e9
    config = MorfemConfig(error_threshold=1e3, max_greedy_iterations=40)

    t0 = time.time()
    result, rm = greedy_basis_matfree(op, b, domain, config=config)
    t_build = time.time() - t0
    print(f"greedy: converged={bool(result.converged)} "
          f"iterations={int(result.iterations)} basis={int(result.ncols)} "
          f"build {t_build:.1f} s")

    t0 = time.time()
    x_r = sweep(rm)
    float(jnp.sum(x_r))
    print(f"reduced sweep ({args.points} pts): {time.time()-t0:.3f} s")

    if args.check_points and args.n <= 16384:
        cd = c.toarray()
        gd = gamma.toarray()
        idx = np.linspace(0, args.points - 1, args.check_points, dtype=int)
        worst = 0.0
        for i in idx:
            f = float(domain[i])
            a_f = cd + gd * f * f
            a_f = (a_f + a_f.T) / 2
            ref = np.linalg.solve(a_f, np.asarray(wp) * f)
            rec = np.asarray(rm.q @ x_r[i])
            err = np.linalg.norm(rec - ref) / np.linalg.norm(ref)
            worst = max(worst, err)
            print(f"  point {i}: rel err vs dense oracle {err:.3e}")
        print("PASS" if worst < 1e-7 else "FAIL (expected < 1e-7)")


if __name__ == "__main__":
    main()
