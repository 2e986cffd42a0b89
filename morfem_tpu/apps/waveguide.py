"""Waveguide application layer: GSM post-processing and problem setup.

TPU-native counterpart of the reference's example application
(test_helpers.py + main.py): a 2-port microwave waveguide discretized by FEM
(N = 3,411 DOF), swept over 3–5 GHz, with the generalized scattering matrix
(S-parameters) computed from the solved fields.

Physics constants and formulas (reference citations):
  * GSM: ``gim = j·2πf·ε0·Eᵀ·B``, ``gam = gim⁻¹``,
    ``gsm = 2·(I + gam)⁻¹ − I``             (test_helpers.py:9-14, eq. 3.28)
  * port-mode coefficient
    ``t_b(f) = √(√((2πf/c)² − kTE²)/f)``     (test_helpers.py:70-72)
  * physical scalings applied to the loaded data:
    ``Γ ·= −((2π)/c)²``, ``B ·= √(1/(8·10⁻⁷·π²))``   (main.py:25-26)
  * the system is ``(C + f²·Γ)·X = t_b(f)·B`` — ModelDefinition slots
    (C, 0, Γ) with coefficients (1, f, f²)   (test_helpers.py:28-38)

Everything here is batched: the GSM of all I frequency points is computed as
one einsum + one batched M×M inversion pair, instead of the reference's
per-point Python loop (test_helpers.py:43-48).
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.constants import c as C_LIGHTSPEED
from scipy.constants import epsilon_0 as EPSILON_0
from scipy.constants import pi as PI

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.api import build_reduced_model
from morfem_tpu.mor.reduced import sweep
from morfem_tpu.ops.solve import solve_sweep
from morfem_tpu.system import AffineSystem
from morfem_tpu.utils.timing import PhaseTimer

# TE-mode cutoff wavenumber of the bundled waveguide's ports
# (reference test_helpers.py:71; equals data/kTE1.npy == data/kTe2.npy)
KTE_DEFAULT = 54.5976295582387

# Physical scaling constants applied to raw Ct/Tt/WP data (main.py:25-26)
GAMMA_SCALE = -((2 * PI) / C_LIGHTSPEED) ** 2
B_SCALE = math.sqrt(1 / (8 * 1e-7 * PI**2))


def b_coefficient(t, kte: float = KTE_DEFAULT):
    """Port-mode normalization coefficient √(√((2πt/c)² − kTE²)/t).

    JAX-traceable; real for frequencies above the TE cutoff
    (reference: test_helpers.py:70-72).
    """
    k0_sq = ((2 * PI * t) / C_LIGHTSPEED) ** 2
    return jnp.sqrt(jnp.sqrt(k0_sq - kte**2) / t)


def gim_real(frequency: jax.Array, e: jax.Array, b: jax.Array) -> jax.Array:
    """Y = 2πf·ε0·EᵀB — the real factor of the GIM (gim = j·Y).

    Batched over leading axes; everything real, so it runs in f64 on TPU
    (TPU supports no complex128 at all).
    """
    from morfem_tpu.ops.precision import precise_matmul

    etb = precise_matmul(jnp.swapaxes(e, -1, -2), b)  # EᵀB, N-contraction
    return (
        2 * PI * jnp.asarray(frequency)[..., None, None] * EPSILON_0 * etb
    )


def gsm_from_y(y: jax.Array):
    """GSM (re, im) parts from the real GIM factor Y — pure real arithmetic.

    With gim = j·Y (E and B real — true for the reference's wave problem,
    whose solutions are real, implementation.py:190), the reference map
    ``gam = gim⁻¹; gsm = 2(I+gam)⁻¹ − I`` (test_helpers.py:9-14) reduces to

        Z = Y⁻¹;  W = (I + Z²)⁻¹;  gsm = (2·W − I)  +  j·(2·Z·W)

    using (I − jZ)⁻¹ = (I + jZ)(I + Z²)⁻¹ (Z commutes with functions of
    itself). This keeps the whole post-processing in real f64 on TPU.
    """
    from morfem_tpu.ops.solve import inv_refined

    m = y.shape[-1]
    eye = jnp.eye(m, dtype=y.dtype)
    # mixed-precision inverses: jnp.linalg.inv lowers to LU, which TPU only
    # implements in f32/c64
    z = inv_refined(y)
    w = inv_refined(eye + z @ z)
    re = 2 * w - eye
    im = 2 * (z @ w)
    return re, im


def generalized_scattering_matrix(
    frequency: jax.Array, e: jax.Array, b: jax.Array
) -> np.ndarray:
    """GSM from solved fields — batched over leading axes.

    Args:
      frequency: [...] frequency points.
      e: [..., N or Nr, M] solved fields (full-order X or reduced x_r).
      b: [..., N or Nr, M] impulse vectors IN THE SAME SPACE as ``e``
        (reduced solutions pair with the reduced b_r — consistent because
        Eᵀ·B = x_rᵀ·(Qᵀb) ≡ (Q·x_r)ᵀ·b; reference test_helpers.py:60-65).

    Returns:
      [..., M, M] complex128 scattering matrices (reference:
      test_helpers.py:9-14). For real inputs the computation runs entirely
      in real f64 on device (see `gsm_from_y`) and the complex packing
      happens on the host — TPU has no complex128 type. Complex inputs
      take the direct complex path (CPU/GPU only).
    """
    e = jnp.asarray(e)
    b = jnp.asarray(b)
    if not (jnp.iscomplexobj(e) or jnp.iscomplexobj(b)):
        re, im = gsm_from_y(gim_real(frequency, e, b))
        return np.asarray(re) + 1j * np.asarray(im)
    gim = 1j * gim_real(frequency, e, b)
    m = gim.shape[-1]
    eye = jnp.eye(m, dtype=gim.dtype)
    gam = jnp.linalg.inv(gim)
    return np.asarray(2 * jnp.linalg.inv(eye + gam) - eye)


class WaveguideData(NamedTuple):
    """Raw (unscaled) waveguide FEM data: C, T, B port columns, kTE."""

    c_mat: np.ndarray  # [N, N] stiffness-like
    t_mat: np.ndarray  # [N, N] mass-like
    wp: np.ndarray  # [N, M] port excitation columns
    kte: float
    synthetic: bool  # True when Ct/Tt were regenerated (blobs missing)


def synthesize_ct_tt(
    n: int, seed: int = 2024, modes_in_band: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-ins for the missing Ct/Tt blobs.

    The reference repo lists data/Ct.npy and data/Tt.npy as missing large
    blobs (.MISSING_LARGE_BLOBS:1-2). This builds SPD matrices whose
    generalized spectrum places exactly ``modes_in_band`` modes inside the
    3–5 GHz k₀² band (offset from the 100-point sweep grid so A(f) never
    becomes singular at a grid point), a tail below cutoff and the bulk
    above — the qualitative spectrum of a waveguide discretization. The
    swept problem then shows a handful of sharp resonances, like the real
    device, instead of a quasi-random dense spectrum.
    """
    rng = np.random.default_rng(seed)
    k0sq_lo = (2 * PI * 3e9 / C_LIGHTSPEED) ** 2
    k0sq_hi = (2 * PI * 5e9 / C_LIGHTSPEED) ** 2

    # target generalized eigenvalues λ of (C, T)
    n_below = max(2, n // 20)
    n_above = n - n_below - modes_in_band
    band_pos = (np.arange(modes_in_band) + 0.37) / modes_in_band  # off-grid
    lam = np.concatenate(
        [
            k0sq_lo * np.geomspace(1e-3, 0.8, n_below),
            k0sq_lo + band_pos * (k0sq_hi - k0sq_lo),
            k0sq_hi * np.geomspace(1.3, 300.0, n_above),
        ]
    )
    rng.shuffle(lam)

    # random orthogonal V; C = V·diag(λ)·Vᵀ (SPD), T ≈ I + small banded sym
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    c_mat = (v * lam) @ v.T
    c_mat = (c_mat + c_mat.T) / 2
    t_band = np.zeros((n, n))
    for k in range(1, 6):
        d = rng.uniform(-1.0, 1.0, size=n - k) * (0.3**k)
        idx = np.arange(n - k)
        t_band[idx, idx + k] = d
    t_mat = np.eye(n) + 0.05 * (t_band + t_band.T)
    return c_mat, t_mat


def synthesize_waveguide(
    n: int, m: int = 2, seed: int = 2024, modes_in_band: int = 8
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full synthetic waveguide: (C, T, WP) with resonant port coupling.

    Ports built from random vectors alone couple to the in-band modes at
    only O(1/√N), giving a flat −40 dB-ish S21 — nothing like the real
    device. Here the port columns mix strong components along the in-band
    modal vectors (so resonances transmit, like a coupled-cavity filter)
    with a broadband random background.
    """
    rng = np.random.default_rng(seed)
    k0sq_lo = (2 * PI * 3e9 / C_LIGHTSPEED) ** 2
    k0sq_hi = (2 * PI * 5e9 / C_LIGHTSPEED) ** 2

    n_below = max(2, n // 20)
    band_pos = (np.arange(modes_in_band) + 0.37) / modes_in_band
    lam_band = k0sq_lo + band_pos * (k0sq_hi - k0sq_lo)
    lam = np.concatenate(
        [
            k0sq_lo * np.geomspace(1e-3, 0.8, n_below),
            lam_band,
            k0sq_hi * np.geomspace(1.3, 300.0, n - n_below - modes_in_band),
        ]
    )
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    c_mat = (v * lam) @ v.T
    c_mat = (c_mat + c_mat.T) / 2
    t_band = np.zeros((n, n))
    for k in range(1, 6):
        d = rng.uniform(-1.0, 1.0, size=n - k) * (0.3**k)
        idx = np.arange(n - k)
        t_band[idx, idx + k] = d
    t_mat = np.eye(n) + 0.05 * (t_band + t_band.T)

    v_band = v[:, n_below : n_below + modes_in_band]  # in-band modal vectors
    alpha = rng.uniform(0.5, 1.5, size=(modes_in_band, m)) * rng.choice(
        [-1.0, 1.0], size=(modes_in_band, m)
    )
    wp = v_band @ alpha + 0.05 * rng.standard_normal((n, m))
    return c_mat, t_mat, wp


def calibrate_port_amplitude(
    c_mat: np.ndarray,
    t_mat: np.ndarray,
    wp: np.ndarray,
    f_probe: float = 4.1e9,
    kte: float = KTE_DEFAULT,
) -> np.ndarray:
    """Rescale port columns so the GIM is O(1) at mid-band.

    The GSM map ``gam = gim⁻¹, gsm = 2(I+gam)⁻¹ − I`` only produces
    non-trivial S-parameters when ``gim = j·2πf·ε0·EᵀB`` has O(1)
    magnitude (the real data's physical scalings achieve this). Since gim
    scales quadratically with the port-column amplitude, one mid-band probe
    solve pins the right scale for synthetic data.
    """
    gamma = t_mat * GAMMA_SCALE
    b = wp * B_SCALE
    a = c_mat + (f_probe**2) * gamma
    tb = math.sqrt(
        math.sqrt(((2 * PI * f_probe) / C_LIGHTSPEED) ** 2 - kte**2) / f_probe
    )
    e = np.linalg.solve(a, tb * b)
    # NOTE both t_b factors: one inside E = A⁻¹(t_b·B) and one in the GSM's
    # b argument (reference test_helpers.py:43-48 passes b_coefficient(f)·B)
    y = 2 * PI * f_probe * EPSILON_0 * np.abs(e.T @ (tb * b))
    scale = 1.0 / math.sqrt(max(np.linalg.norm(y), 1e-300))
    return wp * scale


def load_waveguide_data(
    data_dir: Optional[str] = None,
    n_fallback: int = 3411,
    m_fallback: int = 2,
    cache_dir: Optional[str] = None,
) -> WaveguideData:
    """Load the bundled waveguide data, regenerating missing blobs.

    Stays loader-compatible with the reference's ``data/`` layout
    (main.py:21-23): Ct.npy, Tt.npy, WP.npy, kTE1.npy. Ct/Tt are absent
    from the reference mount; deterministic synthetic stand-ins with the
    correct shapes are produced instead (flagged via ``synthetic=True``)
    and cached in ``cache_dir`` (the spectral construction costs an O(N³)
    QR on the host).
    """
    def _find(name):
        if data_dir is None:
            return None
        for cand in (name, name.lower(), name.upper()):
            p = os.path.join(data_dir, cand)
            if os.path.exists(p):
                return p
        return None

    kte = KTE_DEFAULT
    p = _find("kTE1.npy")
    if p:
        kte = float(np.asarray(np.load(p)).reshape(-1)[0])

    wp_path = _find("WP.npy")
    if wp_path:
        wp = np.asarray(np.load(wp_path), dtype=np.float64)
        if wp.ndim == 1:
            wp = wp[:, None]
    else:
        rng = np.random.default_rng(7)
        wp = np.zeros((n_fallback, m_fallback))
        for j in range(m_fallback):
            rows = rng.choice(n_fallback, size=19, replace=False)
            wp[rows, j] = rng.uniform(0.3, 1.2, size=19)

    n = wp.shape[0]
    ct_path, tt_path = _find("Ct.npy"), _find("Tt.npy")
    if ct_path and tt_path:
        c_mat = np.asarray(np.load(ct_path), dtype=np.float64)
        t_mat = np.asarray(np.load(tt_path), dtype=np.float64)
        synthetic = False
    else:
        cache = None
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            cache = os.path.join(cache_dir, f"synthetic_wg_{n}.npz")
        if cache and os.path.exists(cache):
            z = np.load(cache)
            c_mat, t_mat, wp = z["c"], z["t"], z["wp"]
        else:
            # Ct/Tt blobs are missing; the real WP alone cannot reproduce
            # resonant port coupling against synthetic matrices, so the
            # whole (C, T, WP) triple is synthesized coherently.
            c_mat, t_mat, wp = synthesize_waveguide(n, m=wp.shape[1])
            wp = calibrate_port_amplitude(c_mat, t_mat, wp, kte=kte)
            if cache:
                np.savez(cache, c=c_mat, t=t_mat, wp=wp)
        synthetic = True
    return WaveguideData(c_mat, t_mat, wp, kte, synthetic)


def waveguide_system(
    frequency_points,
    data: WaveguideData,
    dtype=jnp.float64,
) -> AffineSystem:
    """Build the swept waveguide AffineSystem with physical scalings.

    Applies the reference's data scalings (main.py:25-26) and slot layout
    (test_helpers.py:28-38): a0 = C, a1 = 0, a2 = Γ = scaled T, with
    coefficients (1, f, f²) and t_b the port-mode coefficient.
    """
    n = data.c_mat.shape[0]
    gamma = data.t_mat * GAMMA_SCALE
    b = data.wp * B_SCALE
    kte = data.kte
    # operators stay HOST numpy into create(): the exact-symmetry probe
    # (AffineSystem.symmetric_ops) runs only on host inputs — pre-wrapping
    # in jnp.asarray would both skip the hint and add nothing (create
    # converts via _as_dense anyway)
    return AffineSystem.create(
        jnp.asarray(frequency_points, dtype),
        np.asarray(data.c_mat, np.dtype(dtype)),
        np.zeros((n, n), np.dtype(dtype)),
        np.asarray(gamma, np.dtype(dtype)),
        np.asarray(b, np.dtype(dtype)),
        t_b=lambda t: b_coefficient(t, kte),
        dtype=dtype,
    )


def full_order_gsm(
    sys: AffineSystem,
    config: MorfemConfig = DEFAULT_CONFIG,
    timer: Optional[PhaseTimer] = None,
) -> jax.Array:
    """Full-order ("No MOR") GSM sweep — the oracle path.

    Counterpart of `finite_element_method_gsm` (test_helpers.py:25-50):
    sweep the full-order system, then one batched GSM computation.
    """
    timer = timer or PhaseTimer(disabled=True)
    with timer.phase("full-order sweep"):
        x = solve_sweep(sys, config)
        jax.block_until_ready(x)
    with timer.phase("gsm"):
        _, cb = sys.coefficients(sys.domain)
        # host-complex output; np.asarray inside already synced the device
        gsm = generalized_scattering_matrix(
            sys.domain, x, cb[:, None, None] * sys.b
        )
    return gsm


def mor_gsm(
    sys: AffineSystem,
    config: MorfemConfig = DEFAULT_CONFIG,
    timer: Optional[PhaseTimer] = None,
):
    """MOR GSM sweep.

    Counterpart of `finite_element_method_model_order_reduction_gsm`
    (test_helpers.py:53-67): build the reduced model, sweep it, compute the
    GSM from reduced solutions with the reduced b_r.

    Returns (gsm [I, M, M], reduced_model, greedy_result_or_None).
    """
    timer = timer or PhaseTimer(disabled=True)
    rm, greedy_result = build_reduced_model(sys, config, timer)
    rm = rm.trim()
    with timer.phase("reduced sweep"):
        from morfem_tpu.mor.api import _run_sweep

        x_r = _run_sweep(rm, config)  # auto: spectral when the pencil allows
        jax.block_until_ready(x_r)
    with timer.phase("gsm"):
        _, cb = rm.coefficients(rm.domain)
        gsm = generalized_scattering_matrix(
            rm.domain, x_r, cb[:, None, None] * rm.b_r
        )
    return gsm, rm, greedy_result


def equally_distributed_points(source, amount: int):
    """Evenly spaced subset of a grid — counterpart of the reference helper
    (test_helpers.py:17-22), including its bounds check."""
    source = jnp.asarray(source)
    if amount > source.shape[0]:
        raise ValueError(
            "amount can't be greater than the number of points in the source"
        )
    idx = np.linspace(0, source.shape[0] - 1, amount).astype(int)
    return source[jnp.asarray(idx)]
