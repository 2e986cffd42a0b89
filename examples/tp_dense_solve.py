"""Tensor-parallel dense direct solve — N×N systems across a device mesh.

Demonstrates `parallel/tp_dense.py`: the column-sharded blocked
Gauss-Jordan factorization whose only per-panel communication is one
psum broadcast, plus the two solve shapes built on it:

  * factor once → many right-hand sides (`tp_gj_factor` + f64-refined
    `tp_solve_dense`) — the serving shape;
  * one compiled program end to end (`tp_solve_dense_compiled`) — the
    one-shot shape (refinement `lax.while_loop` runs on-device, zero
    host round-trips after dispatch).

Run on real chips (mesh over the available devices) or on a virtual CPU
mesh:

    python examples/tp_dense_solve.py --cpu --virtual-devices 8 --n 1024
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--rhs", type=int, default=4)
    p.add_argument("--panel", type=int, default=128)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--virtual-devices", type=int, default=0)
    p.add_argument("--check", action="store_true", default=True)
    args = p.parse_args()

    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from morfem_tpu.parallel.mesh import make_mesh
    from morfem_tpu.parallel.tp_dense import (
        tp_gj_factor,
        tp_solve_dense,
        tp_solve_dense_compiled,
    )

    tp = len(jax.devices())
    mesh = make_mesh(dp=1, sp=1, tp=tp)
    print(f"devices: {tp}  mesh: tp={tp}  N={args.n}")

    rng = np.random.default_rng(0)
    n = args.n
    a = jnp.asarray(rng.standard_normal((n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal((n, args.rhs)))

    # --- factor once, refine-solve (serving shape) ---
    t0 = time.perf_counter()
    fac = tp_gj_factor(a, mesh, panel=args.panel)
    jax.block_until_ready(fac.c)
    t_fac = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = tp_solve_dense(a, b, mesh, fac=fac, panel=args.panel)
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    print(f"factor {t_fac:.2f} s, refined solve {t_solve:.2f} s")

    # --- one compiled program (one-shot shape) ---
    t0 = time.perf_counter()
    x2 = tp_solve_dense_compiled(a, b, mesh, panel=args.panel)
    jax.block_until_ready(x2)
    print(f"compiled one-shot (incl. compile): {time.perf_counter()-t0:.2f} s")

    if args.check:
        ref = np.linalg.solve(np.asarray(a), np.asarray(b))
        for name, xx in (("refined", x), ("compiled", x2)):
            rel = float(
                np.linalg.norm(np.asarray(xx) - ref) / np.linalg.norm(ref)
            )
            print(f"  {name}: rel error vs numpy {rel:.2e}")
            assert rel < 1e-10, rel
        print("OK")


if __name__ == "__main__":
    main()
