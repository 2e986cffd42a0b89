"""Fine-grained cold-compile ablation of the greedy loop's IN-CONTEXT pieces.

`tools/compile_ablation.py` times the big jitted instances as a caller
would build them standalone; the numbers overstate the in-loop cost
because the greedy body shares hoisted operand splits. This probe times
the pieces EXACTLY as `_greedy_basis_impl` wires them (shared applies,
masked padded shapes) plus the full loop under XLA compiler-effort
options, to find where the <30 s cold-compile budget (round-3 verdict
item #2) must come from.

Usage: python tools/compile_ablation2.py [N] [I]   (default 3411 100)
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_enable_x64", True)
# NO persistent cache: true compile cost per instance.

import jax.numpy as jnp
import numpy as np


def _time_compile(name, fn, *args, compiler_options=None):
    t0 = time.perf_counter()
    lowered = jax.jit(fn, compiler_options=compiler_options).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(
        f"{name:<36s} lower {t_lower:6.1f}s   compile {t_compile:6.1f}s",
        flush=True,
    )
    return compiled, t_compile


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
    from morfem_tpu.mor.reduced import assemble_reduced, solve_reduced_batch
    from morfem_tpu.ops.assembly import SharedAffineApply
    from morfem_tpu.ops.orthonormalize import (
        column_mask,
        orthonormalize_append_cgs2,
    )
    from morfem_tpu.ops.precision import precise_matmul_chunked
    from morfem_tpu.ops.solve import solve_point

    print(f"backend: {jax.default_backend()}  N={n} I={i}", flush=True)
    cfg = MorfemConfig(
        solve_chunk=20, error_threshold=1e-8, orthonormalization="mgs"
    )  # mirror bench.py

    data = load_waveguide_data(
        n_fallback=n,
        cache_dir=os.path.join(REPO, "data", "synthetic_cache"),
    )
    freq = np.linspace(3e9, 5e9, i)
    sys_ = waveguide_system(freq, data)
    k = max_basis_columns(sys_.m, cfg, sys_.n)
    q = jnp.zeros((sys_.n, k), jnp.float64)
    ncols = jnp.asarray(4)
    m = sys_.m

    # NOTE: the shared applies must be built INSIDE the traced functions
    # (from the system argument) exactly as _greedy_basis_impl does —
    # closing over them bakes ~0.5 GB of Ozaki slices into the HLO as
    # constants and the axon remote-compile request dies with HTTP 413.

    # ---- pieces as the greedy body wires them ----
    def images_shared(s, q, ncols):
        shared_raw = SharedAffineApply(s.operators(), symmetrize=False)
        return operator_images(s, q, ncols, shared=shared_raw)

    _time_compile("operator_images(shared)", images_shared, sys_, q, ncols)

    def reduced_from_u(s, q, ncols):
        u = jnp.stack([q, q, q]).astype(q.dtype)  # placeholder [3,N,K]
        return _reduced_from_u(s, q, ncols, u)

    _time_compile("_reduced_from_u", reduced_from_u, sys_, q, ncols)

    def reduced_batch(s, q, ncols):
        shared_raw = SharedAffineApply(s.operators(), symmetrize=False)
        u = operator_images(s, q, ncols, shared=shared_raw)
        rm = _reduced_from_u(s, q, ncols, u)
        a, rhs = assemble_reduced(rm, rm.domain, cfg)
        return solve_reduced_batch(a, rhs, cfg)

    _time_compile("images+reduce+batchLU", reduced_batch, sys_, q, ncols)

    def estimator_in_context(s, q, ncols):
        shared_raw = SharedAffineApply(s.operators(), symmetrize=False)
        u = operator_images(s, q, ncols, shared=shared_raw)
        rm = _reduced_from_u(s, q, ncols, u)
        err, _ = estimate_errors_direct(rm, u, s.b, cfg)
        return err

    _time_compile(
        "estimator(in-context)", estimator_in_context, sys_, q, ncols
    )

    def snapshot_in_context(s, t):
        shared_sym = SharedAffineApply(s.operators(), symmetrize=True)
        return solve_point(s, t, cfg, shared=shared_sym)

    _time_compile(
        "solve_point(shared)", snapshot_in_context, sys_, sys_.domain[0]
    )

    def expand_in_context(q, ncols, x_new):
        mask = column_mask(k, ncols, q.dtype)

        def project_out(v):
            coeff = precise_matmul_chunked(q.conj().T, v)
            return v - jnp.matmul(
                q, coeff * mask[:, None], precision=jax.lax.Precision.HIGHEST
            )

        resid = project_out(project_out(x_new))
        q2, nc2 = orthonormalize_append_cgs2(q, ncols, x_new)
        return q2, nc2, jnp.linalg.norm(resid)

    x_new = jnp.zeros((sys_.n, m), jnp.float64)
    _time_compile("expand+stagnation", expand_in_context, q, ncols, x_new)

    # ---- the full loop, then compiler-effort variants ----
    _, t_base = _time_compile(
        "greedy FULL", lambda s: _greedy_basis_impl(s, config=cfg), sys_
    )
    for opts in (
        {"exec_time_optimization_effort": -0.7},
        {"exec_time_optimization_effort": -1.0},
    ):
        try:
            _time_compile(
                f"greedy FULL {opts}",
                lambda s: _greedy_basis_impl(s, config=cfg),
                sys_,
                compiler_options=opts,
            )
        except Exception as e:
            print(f"  {opts} -> {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
