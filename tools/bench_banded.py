"""Large-N banded-direct MOR benchmark (BASELINE config 3) — subprocess unit.

The reference's ~34k-DOF stress case is the rate-10 block-diagonal upscale
(fake_interpolate_bigger_sample.py:1-34) solved by splu at any N
(implementation.py:474-476); the TPU-native equivalent is the matrix-free
route through morfem(): RCM-banded block-tridiagonal direct snapshot solves
+ matvec-only greedy estimator.

Run standalone or (production path) as a subprocess of bench.py with its own
timeout, so an unbounded compile here can NEVER cost the headline artifact
(the round-4 failure mode: BENCH_r04 rc=124). Prints exactly ONE JSON line
to stdout with `banded_*` keys; all progress goes to stderr.

Knobs (env):
  BENCH_BANDED_P      cross-section side p; N = p^2 (default 97 -> N=9409;
                      185 -> the N=34225 stress case, recorded standalone in
                      BANDED_34K.json — its ~7 min wall cannot fit the bench
                      subprocess budget, measured round 5)
  BENCH_BANDED_POINTS frequency grid size (default 100)
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(_CACHE_DIR))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from morfem_tpu import MorfemConfig
    from morfem_tpu import morfem as morfem_api
    from morfem_tpu.apps.waveguide import GAMMA_SCALE
    from morfem_tpu.ops.block_tridiag import banded_direct_solve, banded_via_rcm
    from morfem_tpu.utils.synthetic import banded_waveguide_system_2d

    n_points = int(os.environ.get("BENCH_BANDED_POINTS", 100))
    freq = np.linspace(3e9, 5e9, n_points)

    # 2-D P1-FEM cross-section, N = p^2: the 1-D chain at this N is either
    # too ill-conditioned (long mesh) or too modally dense (short mesh) —
    # see banded_waveguide_system_2d's docstring. The 2-D pencil has
    # cond ~ N and ~11 in-band resonances: the same physics regime as the
    # bundled N=3411 problem.
    bp = int(os.environ.get("BENCH_BANDED_P", 97))
    c_sp, tt_sp, wp = banded_waveguide_system_2d(bp, m=2, seed=1)
    bn = c_sp.shape[0]
    log(f"banded bench: p={bp} N={bn}")
    gamma_sp = (tt_sp * GAMMA_SCALE).tocsr()
    zero_sp = 0.0 * c_sp
    cfg_b = MorfemConfig(error_threshold=1e-8)
    t0 = time.perf_counter()
    xb, qb, *_ = morfem_api(freq, c_sp, zero_sp, gamma_sp, wp, config=cfg_b)
    jax.block_until_ready(xb)
    t_banded = time.perf_counter() - t0
    nr_b = qb.shape[1]
    log(f"morfem() build+sweep: {t_banded:.1f} s (Nr={nr_b})")

    # oracle: banded full-order direct solves at a grid subset
    op_b, perm_b = banded_via_rcm(
        c_sp, zero_sp, gamma_sp, symmetrize=cfg_b.symmetrize
    )
    b_dev = jnp.asarray(wp)[perm_b]
    idx = np.linspace(0, n_points - 1, 7, dtype=int)
    # operator and rhs cross the jit boundary as ARGUMENTS: a closure
    # embeds the [P, N, BW] f64 bands as HLO constants — 617 MB at N=34k,
    # which overflows the axon remote-compile request (HTTP 413; the r3
    # lesson, utils/pytreereg.py)
    solve_b = jax.jit(
        lambda op, bd, c, cb: banded_direct_solve(op, c, cb * bd, cfg_b)[0]
    )
    t_vals = jnp.asarray(freq)[idx]
    cs_b = jnp.stack([jnp.ones_like(t_vals), t_vals, t_vals**2], axis=-1)
    cbs_b = t_vals
    t0 = time.perf_counter()
    x_oracle = jnp.stack(
        [solve_b(op_b, b_dev, cs_b[j], cbs_b[j]) for j in range(len(idx))]
    )
    float(jnp.sum(x_oracle))
    t_oracle = (time.perf_counter() - t0) / len(idx)
    qb_perm = jnp.asarray(qb)[perm_b]  # oracle lives in RCM order
    rec_b = jnp.einsum("nk,ikm->inm", qb_perm, xb[idx])
    rel_b = float(jnp.linalg.norm(rec_b - x_oracle) / jnp.linalg.norm(x_oracle))
    log(
        f"banded-direct MOR N={bn}: build+sweep {t_banded:.1f} s "
        f"(Nr={nr_b}), rel err vs banded oracle {rel_b:.2e}, oracle "
        f"full-order solve {t_oracle*1e3:.0f} ms/pt (incl dispatch)"
    )
    print(
        json.dumps(
            {
                "banded_n_dof": bn,
                "banded_mor_total_s": round(t_banded, 2),
                "banded_basis_size": int(nr_b),
                "banded_rel_error_vs_oracle": rel_b,
                "banded_full_order_ms_per_point": round(t_oracle * 1e3, 1),
                "banded_points_per_s": round(n_points / t_banded, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
