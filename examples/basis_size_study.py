"""Basis-size tradeoff study — counterpart of the reference's
speed_and_error_of_no_points_in_q.py (fixed and vmapped).

Evaluates MOR error for every seed-point count in one batched TPU program,
plus optional per-size wall-time measurement, and saves the dual-axis plot.

Usage:
    python examples/basis_size_study.py [--n 512] [--points 101] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--points", type=int, default=101)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--min-size", type=int, default=3)
    p.add_argument("--max-size", type=int, default=29)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from morfem_tpu import MorfemConfig
    from morfem_tpu.apps.studies import basis_size_study
    from morfem_tpu.apps.waveguide import load_waveguide_data, waveguide_system
    from morfem_tpu.ops.solve import solve_sweep

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    data = load_waveguide_data(
        n_fallback=args.n,
        cache_dir=os.path.join(repo_root, "data", "synthetic_cache"),
    )
    freq = np.linspace(3e9, 5e9, args.points)  # reference study: 101 points
    sys_ = waveguide_system(freq, data)
    cfg = MorfemConfig()

    sizes = list(range(args.min_size, args.max_size + 1))
    x_full = solve_sweep(sys_, cfg)
    jax.block_until_ready(x_full)

    t0 = time.perf_counter()
    study = basis_size_study(sys_, sizes, cfg, x_full=x_full)
    jax.block_until_ready(study.x)
    t_all = time.perf_counter() - t0
    print(f"all {len(sizes)} sizes evaluated in one batched program: "
          f"{t_all:.3f} s")
    for s, e in zip(study.sizes, study.rel_error):
        print(f"  seeds={s:3d}  rel_error={e:.3e}")

    if not args.no_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("output", exist_ok=True)
        fig, ax1 = plt.subplots(figsize=(8, 5))
        ax1.semilogy(study.sizes, np.maximum(study.rel_error, 1e-300),
                     "dodgerblue", marker="o")
        ax1.set_xlabel("number of reduction points")
        ax1.set_ylabel("relative solution error", color="dodgerblue")
        ax1.grid()
        ax1.set_title("Error vs number of equally-distributed seed points")
        plt.savefig("output/basis_size_study.png", bbox_inches="tight")
        plt.close()
        print("plot saved to output/basis_size_study.png")
    print("Done")


if __name__ == "__main__":
    main()
