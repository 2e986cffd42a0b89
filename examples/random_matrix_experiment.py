"""Random-matrix MOR prototype — counterpart of the reference's
experiments.py (the self-contained early experiment: random diagonally-heavy
system, snapshot solves at 5 seed points, QR orthonormalization, projection,
sparsity spy plots; experiments.py:45-95).

The reference left its S-parameter part unfinished (experiments.py:88-93);
here the sweep is completed with the library's reduced-sweep path.

Usage:
    python examples/random_matrix_experiment.py [--n 1000] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--m", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-plots", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from morfem_tpu import AffineSystem, MorfemConfig, project, sweep
    from morfem_tpu.ops.solve import solve_batch
    from morfem_tpu.utils.synthetic import diagonal_heavy_matrix

    key = jax.random.PRNGKey(0)
    k0, k1, k2, kb = jax.random.split(key, 4)
    n, m = args.n, args.m
    # reference setup (experiments.py:45-59): Γ + s·G + s²·C, impulse s·B·I.
    # Diagonal shifts keep A(s) well-conditioned across the sweep band —
    # the reference's raw random matrices made A(s) near-singular at the
    # high end, which is why its sweep was never finished.
    gamma = diagonal_heavy_matrix(k0, n, 10.0, 0.02) + 30.0 * jnp.eye(n)
    g_mat = diagonal_heavy_matrix(k1, n, 10.0, 0.02)
    c_mat = diagonal_heavy_matrix(k2, n, 10.0, 0.02) + 15.0 * jnp.eye(n)
    b = jax.random.uniform(kb, (n, m), jnp.float64, -10.0, 10.0)

    seed_points = jnp.asarray([3.0, 3.5, 4.0, 4.5, 5.0])  # experiments.py:50
    sys_ = AffineSystem.create(
        jnp.linspace(3.0, 5.0, 21), gamma, g_mat, c_mat, b
    )
    cfg = MorfemConfig()

    # snapshot solves at the 5 seed points, batched
    snaps = solve_batch(sys_, seed_points, cfg)  # [5, N, M]
    q_cols = jnp.moveaxis(snaps, 0, 1).reshape(n, -1)
    # QR orthonormalization, like the reference (experiments.py:69)
    q = jnp.linalg.qr(q_cols)[0]

    rm = project(sys_, q)
    x = sweep(rm, cfg)
    print(f"reduced model: {rm.q.shape[1]} columns; sweep x{x.shape}")

    # completed frequency sweep (the part the reference left unfinished)
    rec = jnp.einsum("nk,ikm->inm", rm.q, x)
    from morfem_tpu.ops.solve import solve_sweep

    x_full = solve_sweep(sys_, cfg)
    rel = float(
        jnp.linalg.norm(rec - x_full) / jnp.linalg.norm(x_full)
    )
    print(f"relative error vs full-order sweep: {rel:.3e}")

    if not args.no_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("output", exist_ok=True)
        fig, plots = plt.subplots(1, 2, figsize=(10, 5))
        plots[0].spy(np.abs(np.asarray(gamma)) > 1e-12, markersize=0.2)
        plots[0].set_title("Original Gamma")
        plots[1].spy(np.abs(np.asarray(rm.r0)) > 1e-12, markersize=2)
        plots[1].set_title("Reduced Gamma")
        plt.savefig("output/random_matrix_spy.png", bbox_inches="tight")
        plt.close()
        print("plot saved to output/random_matrix_spy.png")
    print("Done")


if __name__ == "__main__":
    main()
