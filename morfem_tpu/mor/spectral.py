"""Spectral (diagonalized) reduced sweep for two-term pencils.

The wave-equation problems this library targets assemble as a TWO-term
affine pencil: the reference waveguide is ``A(f) = C + f²·Γ`` with the a1
slot zero (test_helpers.py:28-38). For such pencils the reduced model can
be diagonalized ONCE and the whole frequency sweep collapses from I batched
LU factorizations to two small matmuls and an elementwise divide:

    A(t) = c0(t)·R0 + c2(t)·R2,   with  σ·R2  symmetric positive definite
    W·Wᵀ = σ·R2                   (Cholesky)
    B̃ = W⁻¹·R0·W⁻ᵀ = U·diag(λ)·Uᵀ  (symmetric eigendecomposition)

    x(t) = W⁻ᵀ·U · diag( c_b(t) / (c0(t)·λ + σ·c2(t)) ) · Uᵀ·W⁻¹·b_r

Cost per point: O(K·M) after an O(K³) one-time prepare — versus O(K³) per
point for the LU path. On a dense 10k-point grid this is the difference
between ~200 ms and ~5 ms on one chip. Accuracy is eigensolver-grade
(~κ·ε), comfortably below the 1e-8 acceptance target.

The general three-term pencil falls back to the batched-LU `sweep`;
`prepare_spectral` raises if neither ±R2 (nor ±R0, with the roles swapped)
is positive definite.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.reduced import ReducedModel
from morfem_tpu.ops.orthonormalize import column_mask


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralModel:
    """Diagonalized two-term reduced model (pytree).

    x(t) = back · diag(cb/(c_pencil0·λ + σ·c_pencil2)) · proj
    where the pencil maps the (possibly swapped) coefficient order.
    """

    lam: jax.Array  # [K] generalized eigenvalues
    proj: jax.Array  # [K, M] = Uᵀ·W⁻¹·b_r
    back: jax.Array  # [K, K] = W⁻ᵀ·U
    sigma: jax.Array  # ±1: sign applied to the SPD term
    swapped: jax.Array  # bool: True if R0 took the SPD role instead of R2
    mask: jax.Array  # [K] active-column mask
    rm: ReducedModel  # the source reduced model (for coefficients/domain)

    def sweep(self, ts: Optional[jax.Array] = None) -> jax.Array:
        return spectral_sweep(self, ts)


def _reject_unsupported(rm: ReducedModel, config: MorfemConfig, quadratic: bool):
    """Guard the real-symmetric diagonalization's assumptions.

    Raises ValueError — which `_run_sweep`'s "auto" dispatch catches to
    fall back to the batched-LU sweep — instead of silently computing a
    wrong answer (ADVICE r1: np.asarray(a, float64) on complex input
    discards the imaginary part with only a NumPy ComplexWarning, and the
    unconditional (a+aᵀ)/2 disagrees with the LU sweep when
    config.symmetrize=False and the reduced operators are non-symmetric).
    """
    import numpy as np

    if rm.r_extra:
        raise ValueError(
            "spectral sweeps support the classic 3-term pencil only "
            f"(model has {3 + len(rm.r_extra)} addends); use the "
            "batched-LU sweep"
        )
    named = [("r0", rm.r0), ("r1", rm.r1), ("r2", rm.r2), ("b_r", rm.b_r)]
    c, cb = rm.coefficients(rm.domain)
    named += [("evaluated coefficients", c), ("evaluated t_b", cb)]
    for name, a in named:
        if np.iscomplexobj(a):
            raise ValueError(
                f"spectral sweep supports real systems only ({name} is "
                "complex); use the batched-LU sweep"
            )
    if not config.symmetrize:
        check = [("r0", rm.r0), ("r2", rm.r2)]
        if quadratic:
            check.append(("r1", rm.r1))
        for name, a in check:
            a = np.asarray(a, np.float64)
            asym = np.linalg.norm(a - a.T)
            if asym > 1e-9 * max(np.linalg.norm(a), 1e-300):
                raise ValueError(
                    f"spectral sweep symmetrizes {name} but "
                    "config.symmetrize=False and it is not numerically "
                    f"symmetric (‖a−aᵀ‖ = {asym:.2e}); use the "
                    "batched-LU sweep"
                )


def _try_cholesky(s) -> Tuple:
    """NumPy Cholesky + validity flag. Host-side on purpose: `prepare` is
    a one-time offline step on K×K matrices, and native f64 beats TPU's
    emulated f64 (whose eigh is only ~1e-9-accurate even after scaling)."""
    import numpy as np

    try:
        return np.linalg.cholesky(s), True
    except np.linalg.LinAlgError:
        return None, False


def prepare_spectral(
    rm: ReducedModel, config: MorfemConfig = DEFAULT_CONFIG
) -> SpectralModel:
    """Diagonalize a two-term reduced pencil (R1 must be ~zero).

    Host-side decision logic (runs once, outside jit): pick the SPD term
    among ±R2 / ±R0, Cholesky it, and symmetric-eig the reduced pencil.
    Works on padded reduced models: padding rows carry an identity block
    that diagonalizes harmlessly, and padded entries of b_r are zero.
    """
    _reject_unsupported(rm, config, quadratic=False)
    r1_norm = float(jnp.linalg.norm(rm.r1))
    scale = float(
        jnp.linalg.norm(rm.r0) + jnp.linalg.norm(rm.r2)
    )
    if r1_norm > 1e-12 * max(scale, 1e-300):
        raise ValueError(
            "spectral sweep requires a two-term pencil (r1 == 0); "
            f"got ‖r1‖ = {r1_norm:.2e}"
        )
    import numpy as np
    import scipy.linalg as spl

    mask = column_mask(rm.k, rm.ncols, rm.r0.dtype)
    pad = np.diag(1.0 - np.asarray(mask))

    def sym(a):
        a = np.asarray(a, np.float64)
        return (a + a.T) * 0.5

    r0 = sym(rm.r0) + pad
    r2 = sym(rm.r2) + pad
    b_masked = np.asarray(rm.b_r, np.float64) * np.asarray(mask)[:, None]

    for swapped, (spd_term, other) in ((False, (r2, r0)), (True, (r0, r2))):
        # Normalize both pencil terms to unit scale before factorizing.
        # The raw waveguide pencil has ‖R0‖/‖R2‖ ~ 1e20; TPU's emulated
        # f64 (f32 exponent range) loses the eigendecomposition entirely
        # at that scale (eigenvalues off by >100×). The scales are folded
        # back into `lam` (·s_other) and `sigma` (·s_spd), leaving the
        # sweep formula unchanged.
        s_spd = float(np.max(np.abs(spd_term)))
        s_other = float(np.max(np.abs(other)))
        s_spd = s_spd if s_spd > 0 else 1.0
        s_other = s_other if s_other > 0 else 1.0
        for sigma in (1.0, -1.0):
            w, ok = _try_cholesky(sigma * spd_term / s_spd)
            if ok:
                # B̃ = W⁻¹·(other/s_other)·W⁻ᵀ, symmetric, ‖B̃‖ = O(1)
                wi_other = spl.solve_triangular(
                    w, other / s_other, lower=True
                )
                btilde = spl.solve_triangular(
                    w, wi_other.T, lower=True
                ).T
                lam, u = np.linalg.eigh((btilde + btilde.T) * 0.5)
                wi_b = spl.solve_triangular(w, b_masked, lower=True)
                proj = u.T @ wi_b
                back = spl.solve_triangular(w.T, u, lower=False)
                dtype = rm.r0.dtype
                return SpectralModel(
                    lam=jnp.asarray(lam * s_other, dtype),
                    proj=jnp.asarray(proj, dtype),
                    back=jnp.asarray(back, dtype),
                    sigma=jnp.asarray(sigma * s_spd, dtype),
                    swapped=jnp.asarray(swapped),
                    mask=mask,
                    rm=rm,
                )
    raise ValueError(
        "spectral sweep needs ±R0 or ±R2 positive definite; "
        "fall back to the LU sweep"
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QuadraticSpectralModel:
    """Diagonalized THREE-term (quadratic) reduced pencil (pytree).

    Companion linearization of (R0 + c1·R1 + c2·R2)·x = cb·b_r in the
    variable u = c1 (with c2 expressed through the coefficient functions
    at sweep time this requires c2 = u² — i.e. the wave form t, t²; see
    `prepare_spectral_quadratic`). Eigen-data is complex; it is stored as
    split real/imaginary f64 arrays so the sweep runs on TPU (which has
    no complex128): for each point,

        x(t) = Re[ V_top · diag(cb/(u(t) − λ)) · w ]

    with (λ, V) the companion eigenpairs and w the projected RHS.
    """

    lam_re: jax.Array  # [2K]
    lam_im: jax.Array  # [2K]
    vtop_re: jax.Array  # [K, 2K]
    vtop_im: jax.Array  # [K, 2K]
    w_re: jax.Array  # [2K, M]
    w_im: jax.Array  # [2K, M]
    mask: jax.Array  # [K]
    rm: ReducedModel

    def sweep(self, ts: Optional[jax.Array] = None) -> jax.Array:
        return spectral_sweep_quadratic(self, ts)


def prepare_spectral_quadratic(
    rm: ReducedModel, config: MorfemConfig = DEFAULT_CONFIG
) -> QuadraticSpectralModel:
    """Diagonalize a quadratic pencil with the wave-form coefficients.

    Requires the coefficient functions to satisfy c0 = 1, c2 = c1² (the
    reference's default form t_a0=1, t_a1=t, t_a2=t²,
    implementation.py:105-107) — verified numerically on the domain. The
    companion linearization

        (R0 + u·R1 + u²·R2)x = cb·b   ⇔
        ([R0 R1] + u·[0  R2])·[x ]  = [cb·b]
        ([0  -I]     [I  0 ])·[u·x]   [0   ]

    reduces the sweep to a 2K-eigen decomposition (host, NumPy complex)
    plus an O(K·M)-per-point evaluation in split-real arithmetic on TPU.
    """
    import numpy as np
    import scipy.linalg as spl

    _reject_unsupported(rm, config, quadratic=True)
    c, cb = rm.coefficients(rm.domain)
    c = np.asarray(c)
    if not np.allclose(c[:, 0], 1.0, rtol=1e-12):
        raise ValueError("quadratic spectral sweep requires t_a0 == 1")
    if not np.allclose(c[:, 2], c[:, 1] ** 2, rtol=1e-12):
        raise ValueError(
            "quadratic spectral sweep requires t_a2 == t_a1**2 "
            "(the wave-equation form)"
        )

    mask = column_mask(rm.k, rm.ncols, rm.r0.dtype)
    mask_np = np.asarray(mask)
    pad = np.diag(1.0 - mask_np)

    def sym(a):
        a = np.asarray(a, np.float64)
        return (a + a.T) * 0.5

    k = rm.k
    r0 = sym(rm.r0) + pad
    r1 = sym(rm.r1)
    r2 = sym(rm.r2) + pad
    b_m = np.asarray(rm.b_r, np.float64) * mask_np[:, None]

    # scale balancing (see prepare_spectral): normalize by the u-scale so
    # companion blocks are O(1)
    u_scale = float(np.max(np.abs(c[:, 1]))) or 1.0
    r1s = r1 * u_scale
    r2s = r2 * (u_scale**2)

    eye = np.eye(k)
    zero = np.zeros((k, k))
    l0 = np.block([[r0, r1s], [zero, -eye]])
    l1 = np.block([[zero, r2s], [eye, zero]])
    # generalized eigenproblem L0·V = −L1·V·Λ  (λ in scaled-u units)
    lam, v = spl.eig(l0, -l1)
    l1v = l1 @ v
    rhs0 = np.concatenate([b_m, np.zeros((k, b_m.shape[1]))], axis=0)
    w = np.linalg.solve(l1v, rhs0)  # [2K, M] complex
    # fold the u scale back: 1/(û − λ̂) = u_scale/(u − λ·u_scale), so the
    # physical-units eigenvalues gain a factor u_scale and so does w
    lam = lam * u_scale
    w = w * u_scale

    dtype = rm.r0.dtype
    return QuadraticSpectralModel(
        lam_re=jnp.asarray(lam.real, dtype),
        lam_im=jnp.asarray(lam.imag, dtype),
        vtop_re=jnp.asarray(v[:k].real, dtype),
        vtop_im=jnp.asarray(v[:k].imag, dtype),
        w_re=jnp.asarray(w.real, dtype),
        w_im=jnp.asarray(w.imag, dtype),
        mask=mask,
        rm=rm,
    )


def spectral_sweep_quadratic(
    sm: QuadraticSpectralModel, ts: Optional[jax.Array] = None
) -> jax.Array:
    """Quadratic-pencil sweep in split-real f64 arithmetic — O(K·M)/point."""
    from morfem_tpu.ops.precision import precise_matmul

    rm = sm.rm
    if ts is None:
        ts = rm.domain
    c, cb = rm.coefficients(ts)
    u = c[:, 1]  # the linearization variable (c2 = u² verified at prepare)
    # complex reciprocal 1/(u − λ) in split-real form
    dre = u[:, None] - sm.lam_re[None, :]  # [I, 2K]
    dim = -sm.lam_im[None, :] + jnp.zeros_like(dre)
    denom = dre * dre + dim * dim
    denom = jnp.where(denom == 0, 1e-300, denom)
    inv_re = dre / denom
    inv_im = -dim / denom
    # y = diag(cb·inv) · w  → [I, 2K, M], split
    y_re = cb[:, None, None] * (
        inv_re[:, :, None] * sm.w_re[None] - inv_im[:, :, None] * sm.w_im[None]
    )
    y_im = cb[:, None, None] * (
        inv_re[:, :, None] * sm.w_im[None] + inv_im[:, :, None] * sm.w_re[None]
    )
    # x = Re[V_top · y] = V_re·y_re − V_im·y_im  (batched over I)
    x = jnp.einsum(
        "kl,ilm->ikm", sm.vtop_re, y_re,
        precision=jax.lax.Precision.HIGHEST,
    ) - jnp.einsum(
        "kl,ilm->ikm", sm.vtop_im, y_im,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x * sm.mask[None, :, None]


def spectral_sweep(
    sm: SpectralModel, ts: Optional[jax.Array] = None
) -> jax.Array:
    """Sweep via the precomputed diagonalization — O(K·M) per point.

    Returns x [I, K, M], identical (to eigensolver accuracy) to
    `morfem_tpu.mor.reduced.sweep`.
    """
    rm = sm.rm
    if ts is None:
        ts = rm.domain
    c, cb = rm.coefficients(ts)  # [I, 3], [I]
    c_other = jnp.where(sm.swapped, c[:, 2], c[:, 0])
    c_spd = jnp.where(sm.swapped, c[:, 0], c[:, 2])
    # A(t) = c_other·OTHER + c_spd·(σ·SPD)·σ → eigenvalues c_other·λ + σ·c_spd
    denom = c_other[:, None] * sm.lam[None, :] + sm.sigma * c_spd[:, None]
    # guard exact zeros (padding eigen-coordinates carry zero projection,
    # but 0·inf would still poison the contraction)
    denom = jnp.where(denom == 0, jnp.asarray(1e-300, denom.dtype), denom)
    coeff = cb[:, None] / denom  # [I, K]
    # x = back · diag(coeff) · proj
    x = jnp.einsum(
        "kl,il,lm->ikm", sm.back, coeff, sm.proj,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x * sm.mask[None, :, None]
