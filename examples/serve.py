"""Serving demo: checkpointed reduced model → spectral sweeps on demand.

The deployment story: the expensive offline phase (greedy basis build on
the full-order system) runs once and its product — the ReducedModel — is
persisted (`save_reduced_model`). A serving process loads it, diagonalizes
the two-term pencil once (`prepare_spectral`), and then answers frequency-
sweep requests over ARBITRARY grids in O(K·M) per point, entirely
independent of the full-order size N.

Usage:
    python examples/serve.py [--n 3411] [--build] [--cpu]

--build (re)builds and checkpoints the model; otherwise an existing
checkpoint is loaded. Then a few sweep "requests" of various grid sizes
are served and timed.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=3411)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--build", action="store_true")
    p.add_argument("--checkpoint", default="output/waveguide_model.npz")
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
        MorfemConfig,
        build_reduced_model,
        load_reduced_model,
        prepare_spectral,
        save_reduced_model,
        spectral_sweep,
    )
    from morfem_tpu.apps.waveguide import (
        b_coefficient,
        gim_real,
        gsm_from_y,
        load_waveguide_data,
        waveguide_system,
    )

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    cfg = MorfemConfig(
        solve_chunk=16, error_threshold=1e-8, orthonormalization="mgs"
    )

    if args.build or not os.path.exists(args.checkpoint):
        print("offline phase: building + checkpointing the reduced model…")
        data = load_waveguide_data(
            n_fallback=args.n,
            cache_dir=os.path.join(repo_root, "data", "synthetic_cache"),
        )
        sys_ = waveguide_system(np.linspace(3e9, 5e9, 100), data)
        t0 = time.perf_counter()
        rm, _ = build_reduced_model(sys_, cfg)
        rm = rm.trim()
        save_reduced_model(
            args.checkpoint, rm, metadata={"n_dof": int(sys_.n)}
        )
        print(f"  built Nr={rm.q.shape[1]} in {time.perf_counter()-t0:.1f} s "
              f"→ {args.checkpoint}")

    print(f"serving phase: loading {args.checkpoint}")
    rm = load_reduced_model(args.checkpoint, t_b=b_coefficient)
    sm = prepare_spectral(rm, cfg)
    print(f"  model: N={rm.q.shape[0]}, Nr={rm.q.shape[1]}")

    @jax.jit
    def answer(grid):
        x = spectral_sweep(sm, grid)
        y = gim_real(grid, x, b_coefficient(grid)[:, None, None] * sm.rm.b_r)
        re, im = gsm_from_y(y)
        s21_db = 10.0 * jnp.log10(re[:, 1, 0] ** 2 + im[:, 1, 0] ** 2)
        return grid[jnp.argmax(s21_db)]

    def serve(lo, hi, points):
        grid = jnp.linspace(lo, hi, points)
        t0 = time.perf_counter()
        peak = float(answer(grid))  # readback = sync
        return time.perf_counter() - t0, peak

    # compile once per grid SIZE (a real server would bucket sizes)
    for lo, hi, pts in ((3e9, 5e9, 256), (3e9, 5e9, 4096), (3e9, 5e9, 100000)):
        t0 = time.perf_counter()
        serve(lo, hi, pts)
        print(f"  compile for {pts}-pt grids: {time.perf_counter()-t0:.1f} s")
    for lo, hi, pts in (
        (3e9, 5e9, 256),
        (3.2e9, 3.4e9, 4096),
        (3e9, 5e9, 100000),
        (4.0e9, 4.3e9, 256),
    ):
        dt, peak = serve(lo, hi, pts)
        print(f"  request {lo/1e9:.1f}–{hi/1e9:.1f} GHz × {pts:>6d} pts: "
              f"{dt*1e3:7.1f} ms ({pts/dt:,.0f} pts/s) "
              f"| S21 peak at {peak/1e9:.4f} GHz")
    print("Done")


if __name__ == "__main__":
    main()
