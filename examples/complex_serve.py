"""Complex serving demo: checkpoint a complex reduced model, re-sweep any grid.

The reference returns a reduced model that re-sweeps arbitrary grids for
ANY input dtype (implementation.py:186; `solve_fem_point` is dtype-generic,
:468-480). The TPU pipelines build complex bases on real 2N embeddings —
but the RETURN is finished into the same reference-contract artifact:
complex Nr×Nr matrices `r_i = qᵀ·a_i·q` and `b_r = qᵀ·b` that a serving
process sweeps on the HOST in native complex128, no device required
(`sweep_complex_reduced`).

Usage:
    python examples/complex_serve.py [--n 600]

Builds an absorbing-Helmholtz-like complex pencil with a complex t_b,
runs `morfem()` (interleaved-embedding matfree route), checkpoints the
returned complex model, reloads it, serves an OFF-GRID sweep, and checks
a few points against the SciPy complex oracle.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def build_pencil(n, seed=7, half=6):
    rng = np.random.default_rng(seed)
    offs = list(range(0, half + 1))
    diags = [(8.0 + rng.random(n)) + 1j * 0.4] + [
        (-0.3 + 0.05j) * np.ones(n - d) for d in offs[1:]
    ]
    a0 = sp.diags(diags, offs).tocsr()
    a0 = (a0 + a0.T) * 0.5  # complex symmetric (NOT hermitian)
    a1 = sp.csr_matrix((n, n))
    a2 = (sp.eye(n) * -1.0).tocsr()
    b = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    return a0, a1, a2, b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=600)
    p.add_argument("--checkpoint", default="output/complex_model.npz")
    args = p.parse_args()

    from morfem_tpu import (
        MorfemConfig,
        ReducedModel,
        load_reduced_model,
        morfem,
        save_reduced_model,
        sweep_complex_reduced,
    )

    n = args.n
    a0, a1, a2, b = build_pencil(n)
    domain = np.linspace(0.8, 2.0, 24)
    fns = dict(
        t_a0=lambda t: jnp.ones_like(t),
        t_a1=lambda t: jnp.zeros_like(t),
        t_a2=lambda t: t**2,
        t_b=lambda t: t * jnp.exp(1j * 0.7 * t),  # complex drive
    )
    cfg = MorfemConfig(
        symmetrize=False, dense_cutoff=256, error_threshold=1e-18
    )
    t0 = time.time()
    x, q, r0, r1, r2, b_r = morfem(domain, a0, a1, a2, b, config=cfg, **fns)
    print(f"offline build: {time.time()-t0:.1f} s  (N={n}, Nr={q.shape[1]})")

    # checkpoint the COMPLEX reduced model through the standard utility
    rm = ReducedModel(
        domain=jnp.asarray(domain), q=jnp.asarray(q),
        r0=jnp.asarray(r0), r1=jnp.asarray(r1), r2=jnp.asarray(r2),
        b_r=jnp.asarray(b_r), ncols=jnp.asarray(q.shape[1]), **fns,
    )
    os.makedirs(os.path.dirname(args.checkpoint) or ".", exist_ok=True)
    save_reduced_model(args.checkpoint, rm)
    rm2 = load_reduced_model(args.checkpoint, **fns)
    print(f"checkpoint round-trip: {args.checkpoint}")

    # serve an OFF-GRID request (finer, shifted grid) on the host
    grid2 = np.linspace(0.85, 1.95, 501)
    t0 = time.time()
    x2 = sweep_complex_reduced(
        np.asarray(rm2.r0), np.asarray(rm2.r1), np.asarray(rm2.r2),
        np.asarray(rm2.b_r), grid2, fns["t_a0"], fns["t_a1"],
        fns["t_a2"], fns["t_b"],
    )
    dt = time.time() - t0
    print(f"served {len(grid2)}-pt off-grid sweep in {dt*1e3:.1f} ms "
          f"({len(grid2)/dt:,.0f} points/s, host complex128)")

    # spot-check against the SciPy complex oracle
    qn = np.asarray(rm2.q)
    worst = 0.0
    for i in (0, 250, 500):
        t = grid2[i]
        mat = (a0 + t**2 * a2).tocsc()
        ref = sp.linalg.spsolve(mat, (t * np.exp(1j * 0.7 * t)) * b)
        rec = qn @ x2[i]
        worst = max(
            worst, float(np.linalg.norm(rec - ref) / np.linalg.norm(ref))
        )
    print(f"worst rel error vs SciPy complex oracle (off-grid): {worst:.2e}")
    assert worst < 1e-8, worst
    print("OK")


if __name__ == "__main__":
    main()
