"""Runtime decomposition of the blocked panel factors on the chip.

Times (dispatch-corrected by varying inputs + scalar readback — the axon
path result-caches identical calls): factor_block f32x6 vs f32x3 (the
difference isolates the trailing-GEMM share), the 27 sequential Pallas
panel kernels alone, and the 27 triangular-inverse pairs alone. Feeds
the factor-optimization decisions (ROUND_NOTES r3 "Known gaps").

Usage: python tools/factor_probe.py
"""

import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np
import morfem_tpu.ops.panel_lu as plu
import morfem_tpu.ops.pallas.panel_factor as pf

rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((16, 3456, 3456)), jnp.float32)

def timeit(name, fn, reps=3):
    out = fn(a); float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for r in range(1, reps + 1):
        ax = a * (1 + 1e-9 * r)
        t0 = time.perf_counter()
        out = fn(ax)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<40s} {best*1e3:8.1f} ms", flush=True)

timeit("factor_block f32x6", jax.jit(lambda a: plu.panel_lu_factor_block(a, trail="f32x6")))
timeit("factor_block f32x3", jax.jit(lambda a: plu.panel_lu_factor_block(a, trail="f32x3")))
# pure panel kernel cost: 27 sequential invocations
def kernels_only(a):
    out = []
    ones = jnp.ones((16, 128), jnp.float32)
    for k in range(27):
        d_t = jnp.swapaxes(a[:, k*128:(k+1)*128, k*128:(k+1)*128], 1, 2)
        fac_t, c_t, piv, av = pf.panel_factor(d_t, ones, interpret=False)
        out.append(fac_t)
    return jnp.stack(out)
timeit("27x panel kernel [16,128,128]", jax.jit(kernels_only))
# inverses only
def invs_only(a):
    outs = []
    eye = jnp.eye(128, dtype=jnp.float32)
    for k in range(27):
        d = a[:, k*128:(k+1)*128, k*128:(k+1)*128]
        l = jnp.tril(d, -1) + eye
        u = jnp.triu(d) + eye
        outs.append((plu._unit_lower_inv(l), plu._upper_inv(u)))
    return outs
timeit("27x linv+uinv [16,128,128]", jax.jit(invs_only))
