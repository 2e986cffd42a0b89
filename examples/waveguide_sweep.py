"""End-to-end waveguide example — counterpart of the reference's main.py.

Runs the full-order ("No MOR") GSM sweep and the MOR sweep on the bundled
2-port waveguide (N = 3,411 DOF by default; synthetic Ct/Tt stand-ins when
the reference blobs are absent), reports the per-frequency GSM error
(mean/max, reference main.py:42-44,67-68) and saves the S-parameter and
error plots to output/ (reference main.py:46-65).

Usage:
    python examples/waveguide_sweep.py [--n 3411] [--points 100] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=3411, help="FEM DOF count")
    p.add_argument("--points", type=int, default=100, help="frequency points")
    p.add_argument("--cpu", action="store_true", help="force CPU platform")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument(
        "--data-dir", default=None,
        help="directory with Ct.npy/Tt.npy/WP.npy/kTE1.npy",
    )
    p.add_argument("--threshold", type=float, default=1e-6)
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np

    from morfem_tpu import MorfemConfig, PhaseTimer
    from morfem_tpu.apps.waveguide import (
        full_order_gsm,
        load_waveguide_data,
        mor_gsm,
        waveguide_system,
    )

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    data = load_waveguide_data(
        data_dir=args.data_dir,
        n_fallback=args.n,
        cache_dir=os.path.join(repo_root, "data", "synthetic_cache"),
    )
    if data.synthetic:
        print(f"(Ct/Tt blobs unavailable — using synthetic stand-ins, "
              f"N={data.c_mat.shape[0]})")

    freq = np.linspace(3e9, 5e9, args.points)  # reference main.py:18
    sys_ = waveguide_system(freq, data)
    cfg = MorfemConfig(error_threshold=args.threshold)

    t0 = time.perf_counter()
    gsm_ref = full_order_gsm(sys_, cfg)
    print(f"No MOR: {time.perf_counter() - t0:.3f} s")  # test_helpers.py:41

    timer = PhaseTimer()
    t0 = time.perf_counter()
    gsm_mor, rm, greedy = mor_gsm(sys_, cfg, timer)
    print(f"MOR: {time.perf_counter() - t0:.3f} s")  # test_helpers.py:58
    print(timer.report())
    print(f"basis size Nr = {rm.q.shape[1]}")

    err = np.linalg.norm(np.asarray(gsm_mor - gsm_ref), axis=(1, 2))
    print("GSM error mean:", err.mean())  # main.py:67
    print("GSM error max: ", err.max())  # main.py:68

    if not args.no_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs("output", exist_ok=True)
        g_ref = np.asarray(gsm_ref)
        g_mor = np.asarray(gsm_mor)
        plt.figure(figsize=(12, 6))
        plt.plot(freq, 20 * np.log10(np.abs(g_ref[:, 0, 0])), "k", label=r"$S_{11}$")
        plt.plot(freq, 20 * np.log10(np.abs(g_ref[:, 1, 0])), "orange", label=r"$S_{21}$")
        plt.plot(freq, 20 * np.log10(np.abs(g_mor[:, 0, 0])), "crimson",
                 linestyle="dashed", label=r"$S_{11,red}$")
        plt.plot(freq, 20 * np.log10(np.abs(g_mor[:, 1, 0])), "crimson",
                 linestyle="dotted", label=r"$S_{21,red}$")
        plt.xlabel("f [Hz]"); plt.ylabel(r"$|S_{11}|, |S_{21}|$ [dB]")
        plt.legend(); plt.grid()
        plt.savefig("output/result.png", bbox_inches="tight")
        plt.close()

        plt.figure(figsize=(12, 6))
        plt.semilogy(freq, np.maximum(err, 1e-300), color="orange")
        plt.xlabel("f [Hz]"); plt.ylabel(r"$\Delta S$")
        plt.grid()
        plt.savefig("output/error.png", bbox_inches="tight")
        plt.close()

        if greedy is not None:
            iters = int(greedy.iterations)
            hist = np.asarray(greedy.err_hist)[:iters]
            plt.figure(figsize=(12, 6))
            for i in range(iters):
                plt.semilogy(freq, np.maximum(hist[i], 1e-300), label=fr"$j={i}$")
            plt.xlabel("f [Hz]"); plt.ylabel("estimator error")
            plt.legend(); plt.grid()
            plt.savefig("output/greedy_iterations.png", bbox_inches="tight")
            plt.close()
        print("plots saved to output/")
    print("Done")


if __name__ == "__main__":
    main()
