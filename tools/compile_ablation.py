"""Cold-compile breakdown of the greedy pipeline on the current backend.

Times XLA compilation (persistent cache OFF) of each big jitted instance
that contributes to `greedy_basis`'s cold start, plus the full loop:

  * panel LU factor (ops/panel_lu.py)
  * solve_point — one snapshot solve incl. adaptive refinement
  * estimator pass — operator images + reduced model + direct estimate
  * orthonormalize (masked SVD)
  * greedy FULL — the whole compiled while_loop

Run on the TPU (default backend) for the numbers that matter; on CPU the
same graphs compile in seconds, which is itself the diagnostic: the cost
is the TPU backend's per-instance passes, not the traced graph (round-3
notes, "Known gaps").

Usage: python tools/compile_ablation.py [N] [I]   (default 3411 100)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_enable_x64", True)
# NO persistent cache: we want true compile cost per instance.

import jax.numpy as jnp
import numpy as np


def _time_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"{name:<28s} lower {t_lower:6.1f}s   compile {t_compile:6.1f}s")
    return t_compile


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3411
    i = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from morfem_tpu.apps.waveguide import load_waveguide_data, waveguide_system
    from morfem_tpu.config import MorfemConfig
    from morfem_tpu.mor.estimator import estimate_errors_direct, operator_images
    from morfem_tpu.mor.greedy import (
        _greedy_basis_impl,
        _reduced_from_u,
        max_basis_columns,
    )
    from morfem_tpu.ops.orthonormalize import orthonormalize_svd_masked
    from morfem_tpu.ops.panel_lu import panel_lu_factor
    from morfem_tpu.ops.solve import solve_point

    print(f"backend: {jax.default_backend()}  N={n} I={i}")
    # mirror bench.py's config so the timed instances are the bench's
    cfg = MorfemConfig(
        solve_chunk=16, error_threshold=1e-8, orthonormalization="mgs"
    )

    data = load_waveguide_data(
        n_fallback=n,
        cache_dir=os.path.join(REPO, "data", "synthetic_cache"),
    )
    freq = np.linspace(3e9, 5e9, i)
    sys_ = waveguide_system(freq, data)
    k = max_basis_columns(sys_.m, cfg, sys_.n)
    q = jnp.zeros((sys_.n, k), jnp.float64)
    ncols = jnp.asarray(4)

    total = 0.0
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)))
    total += _time_compile("panel_lu_factor", panel_lu_factor, a)
    total += _time_compile(
        "solve_point",
        lambda s, t: solve_point(s, t, cfg),
        sys_,
        sys_.domain[0],
    )

    def estimator_pass(s, q, ncols):
        u = operator_images(s, q, ncols)
        rm = _reduced_from_u(s, q, ncols, u)
        err, _ = estimate_errors_direct(rm, u, s.b, cfg)
        return err

    total += _time_compile("estimator_pass", estimator_pass, sys_, q, ncols)
    total += _time_compile(
        "orthonormalize_svd_masked",
        lambda q: orthonormalize_svd_masked(q, 4),
        q,
    )
    print(f"{'sum of pieces':<28s} {'':>20s} {total:6.1f}s")
    _time_compile(
        "greedy FULL",
        lambda s: _greedy_basis_impl(s, config=cfg),
        sys_,
    )


if __name__ == "__main__":
    main()
