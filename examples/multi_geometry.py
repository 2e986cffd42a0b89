"""Multi-geometry parameter batch — BASELINE config 5.

Runs G independent MOR problems (e.g. a geometry/parameter scan of the
waveguide family) through the full pipeline as ONE sharded program on a
('dp','sp','tp') device mesh: snapshot solves and reduced sweeps batch
over the dp axis, operators shard over tp, frequency points over sp.

On a machine without a TPU slice this still demonstrates the path on
virtual CPU devices:

    python examples/multi_geometry.py --cpu --virtual-devices 8
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--geometries", type=int, default=8)
    p.add_argument("--points", type=int, default=64)
    p.add_argument("--seeds", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--virtual-devices", type=int, default=0)
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

    from morfem_tpu import AffineSystem, MorfemConfig
    from morfem_tpu.mor.equally import seed_indices
    from morfem_tpu.parallel.mesh import factorize_mesh, make_mesh
    from morfem_tpu.parallel.sharded import batch_systems, multi_geometry_mor
    from morfem_tpu.utils.synthetic import random_affine_system

    n_dev = len(jax.devices())
    dp, sp, tp = factorize_mesh(n_dev)
    mesh = make_mesh(dp=dp, sp=sp, tp=tp) if n_dev > 1 else None
    print(f"devices: {n_dev}  mesh: dp={dp} sp={sp} tp={tp}")

    cfg = MorfemConfig()
    g = args.geometries
    keys = jax.random.split(jax.random.PRNGKey(0), g)
    systems = []
    for key in keys:
        domain, a0, a1, a2, b = random_affine_system(
            key, n=args.n, m=2, num_points=args.points
        )
        systems.append(AffineSystem.create(domain, a0, a1, a2, b))
    a0s, a1s, a2s, bs, doms = batch_systems(systems)
    sidx = jnp.asarray(seed_indices(args.points, cfg, count=args.seeds))
    coeffs = (
        systems[0].t_a0, systems[0].t_a1, systems[0].t_a2, systems[0].t_b,
    )

    t0 = time.perf_counter()
    x, q = multi_geometry_mor(
        a0s, a1s, a2s, bs, doms, sidx, coeffs, cfg, mesh=mesh
    )
    float(jnp.sum(x))  # sync
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, q = multi_geometry_mor(
        a0s, a1s, a2s, bs, doms, sidx, coeffs, cfg, mesh=mesh
    )
    float(jnp.sum(x))
    t2 = time.perf_counter() - t0
    print(f"{g} geometries × {args.points} points, N={args.n}: "
          f"first {t1:.2f} s (incl. compile), steady {t2:.2f} s")

    # spot-check one geometry against the single-system pipeline
    from morfem_tpu import equally_distributed_basis, project, sweep

    qg = equally_distributed_basis(systems[0], cfg, count=args.seeds)
    rm = project(systems[0], qg)
    xg = sweep(rm, cfg)
    rec_b = np.einsum("nk,ikm->inm", np.asarray(q[0]), np.asarray(x[0]))
    rec_s = np.einsum("nk,ikm->inm", np.asarray(qg), np.asarray(xg))
    rel = np.linalg.norm(rec_b - rec_s) / np.linalg.norm(rec_s)
    print(f"geometry 0 batched-vs-single rel diff: {rel:.2e}")
    print("Done")


if __name__ == "__main__":
    main()
