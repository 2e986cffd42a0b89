"""Synthetic test systems.

The reference's only reusable fixture generator is ``diagonal_heavy_matrix``
(experiments.py:9-24): a random banded matrix whose nonzero density decays
geometrically away from the main diagonal. The bundled waveguide matrices
(data/Ct.npy, data/Tt.npy) are absent from the mount
(.MISSING_LARGE_BLOBS:1-2), so synthetic systems also stand in for the
waveguide-shaped acceptance problem.

All generators are deterministic (jax.random keyed) and return dense
arrays; `morfem_tpu.ops.sparse` can convert to BCOO for the large-N paths.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def diagonal_heavy_matrix(
    key: jax.Array,
    size: int,
    max_abs_value: float = 10.0,
    density: float = 0.5,
    dtype=jnp.float64,
) -> jax.Array:
    """Random matrix with nonzeros concentrated around the diagonal.

    Same intent as the reference generator (experiments.py:9-24): the
    probability that the d-th off-diagonal is populated decays
    geometrically with |d|, and populated diagonals are scaled by the same
    decaying factor, so the matrix is diagonally heavy (well suited as an
    invertible FEM-like stand-in). Implemented dense + vectorized instead
    of the reference's per-diagonal Python loop.
    """
    density = float(min(max(density, 0.0), 1.0))
    k_vals, k_keep = jax.random.split(key)
    i = np.arange(size)
    dist = np.abs(i[:, None] - i[None, :])  # |row - col| ∈ [0, size-1]
    # Geometric decay of keep-probability and magnitude with distance from
    # the diagonal (reference: np.geomspace(1, 1+density, size-1) - 1,
    # experiments.py:11-13); the main diagonal is always kept at weight 1.
    band = np.geomspace(1.0, 1.0 + density, num=max(size, 2)) - 1.0
    decay = np.where(dist == 0, 1.0, band[np.clip(size - 1 - dist, 0, size - 1)])
    decay = jnp.asarray(decay, dtype)
    vals = jax.random.uniform(
        k_vals, (size, size), dtype=dtype, minval=-max_abs_value,
        maxval=max_abs_value,
    )
    # one keep/drop decision per diagonal band, like the reference's
    # per-diagonal coin flip (experiments.py:17)
    keep_band = jax.random.uniform(k_keep, (size,), dtype=dtype)
    keep = keep_band[jnp.asarray(dist)] <= decay
    return vals * decay * keep.astype(dtype)


def random_affine_system(
    key: jax.Array,
    n: int = 64,
    m: int = 2,
    num_points: int = 32,
    t_lo: float = 3.0,
    t_hi: float = 5.0,
    dtype=jnp.float64,
    symmetric: bool = True,
) -> Tuple[jax.Array, ...]:
    """A well-posed random parametric affine system for tests.

    Builds (domain, a0, a1, a2, b) such that
    A(t) = a0 + t·a1 + t²·a2 is safely invertible over [t_lo, t_hi]:
    a0 gets a dominant diagonal shift. Mirrors the reference experiment
    setup (experiments.py:45-66) but deterministic and reproducible.
    """
    k0, k1, k2, kb = jax.random.split(key, 4)
    scale = 1.0 / n

    def mat(k):
        a = jax.random.normal(k, (n, n), dtype=dtype) * scale
        if symmetric:
            a = (a + a.T) * 0.5
        return a

    a0 = mat(k0) + jnp.eye(n, dtype=dtype) * (2.0 + t_hi**2)
    a1 = mat(k1)
    a2 = mat(k2)
    b = jax.random.normal(kb, (n, m), dtype=dtype)
    domain = jnp.linspace(t_lo, t_hi, num_points, dtype=dtype)
    return domain, a0, a1, a2, b


def waveguide_like_system(
    key: jax.Array,
    n: int = 512,
    m: int = 2,
    num_points: int = 100,
    f_lo: float = 3e9,
    f_hi: float = 5e9,
    n_inband: int = 12,
    dtype=jnp.float64,
):
    """Synthetic stand-in for the bundled waveguide problem.

    Shaped like the real data pipeline (main.py:18-26): a stiffness-like
    matrix C (SPD), a mass-like matrix T, B sparse-ish port excitation
    columns, and the C − (2πf/c)²·T parametrization handled by the
    caller's coefficient functions.

    The pencil's SPECTRUM is controlled exactly — that is the physics
    that makes the problem reducible. A real waveguide/cavity has a
    HANDFUL of resonances in its operating band (higher-order FEM modes
    sit far above it), so the 100-point response manifold has fast-
    decaying rank and a ~30-column reduced basis reaches 1e-10. A naive
    random-Wishart pencil instead puts O(N) generalized eigenvalues
    inside the band (measured: 1422 of 3411 in 3–5 GHz) — an
    IRREDUCIBLE quasi-continuum no MOR method can compress, which makes
    greedy non-convergence the CORRECT outcome, not a solver bug.
    Construction: C = R·VΛVᵀ·Rᵀ, T = R·Rᵀ with R well-conditioned, so
    the (C, T) eigenvalues are exactly Λ: ``n_inband`` of them uniform
    in the band's (2πf/c)² range, ~4% below it (propagating low modes),
    the rest log-spaced up to 60× above it (evanescent FEM modes).
    """
    from scipy.constants import c as c_lightspeed

    kr, kv, kl, kb = jax.random.split(key, 4)
    k_lo2 = (2 * np.pi * f_lo / c_lightspeed) ** 2
    k_hi2 = (2 * np.pi * f_hi / c_lightspeed) ** 2
    n_low = max(1, n // 25)
    n_high = n - n_inband - n_low
    host = np.random.default_rng(np.asarray(jax.random.key_data(kl))[-1])
    lam_in = host.uniform(k_lo2 * 1.02, k_hi2 * 0.98, size=n_inband)
    # keep resonances at least a third of a grid spacing away from every
    # sample point: the model is lossless, so a near-exact hit makes that
    # one solve arbitrarily ill-conditioned (beyond f32+refinement reach)
    grid_k2 = (
        2 * np.pi * np.linspace(f_lo, f_hi, num_points) / c_lightspeed
    ) ** 2
    spacing = np.min(np.diff(grid_k2))
    for _ in range(4):
        d = np.abs(lam_in[:, None] - grid_k2[None, :]).min(axis=1)
        lam_in = np.where(d < spacing / 3, lam_in + spacing / 2, lam_in)
    lam_low = host.uniform(0.15 * k_lo2, 0.75 * k_lo2, size=n_low)
    lam_high = np.exp(
        host.uniform(np.log(1.15 * k_hi2), np.log(60 * k_hi2), size=n_high)
    )
    lam = jnp.asarray(np.sort(np.concatenate([lam_low, lam_in, lam_high])),
                      dtype)
    # V orthogonal, R = I + 0.3·G/√n (well-conditioned, generically dense)
    v, _ = jnp.linalg.qr(jax.random.normal(kv, (n, n), dtype=dtype))
    r = jnp.eye(n, dtype=dtype) + 0.3 * jax.random.normal(
        kr, (n, n), dtype=dtype
    ) / jnp.sqrt(n * 1.0)
    from morfem_tpu.ops.precision import precise_matmul

    vl = v * lam[None, :]
    mcore = precise_matmul(vl, v.T)  # VΛVᵀ
    c_mat = precise_matmul(precise_matmul(r, mcore), r.T)
    t_mat = precise_matmul(r, r.T)
    c_mat = (c_mat + c_mat.T) * 0.5
    t_mat = (t_mat + t_mat.T) * 0.5
    # sparse-ish B: a few nonzero entries per port column (like WP.npy's
    # 38 nonzeros over 3411×2)
    nnz = max(4, n // 64)
    b = np.zeros((n, m))
    rng = np.random.default_rng(np.asarray(jax.random.key_data(kb))[-1])
    for j in range(m):
        rows = rng.choice(n, size=nnz, replace=False)
        b[rows, j] = rng.uniform(0.5, 1.0, size=nnz)
    b = jnp.asarray(b, dtype)
    gamma = -t_mat * ((2 * np.pi / c_lightspeed) ** 2)
    domain = jnp.linspace(f_lo, f_hi, num_points, dtype=dtype)
    return domain, c_mat, gamma, b


def banded_waveguide_system(
    n: int,
    m: int = 2,
    half: int = 8,
    seed: int = 0,
    length_m: float = 20.0,
):
    """Banded waveguide-like Helmholtz pencil at large N (SciPy sparse).

    The reference's large-N stress case is the rate-10 block-diagonal
    upscale of the bundled waveguide (fake_interpolate_bigger_sample.py:14),
    whose Ct/Tt blobs are absent from the mount; this generator stands in
    with the real structure those matrices have: a BANDED FEM
    discretization whose pencil (C, T) puts hundreds of modes inside the
    3–5 GHz k₀² band — so A(f) = C − k₀²T is strongly indefinite at every
    in-band frequency, the regime where Jacobi-Krylov stagnates and the
    block-tridiagonal direct solver (ops/block_tridiag) is required.

    Base: 1-D P1 FEM stiffness/mass on [0, L] (tridiagonal, h = L/(n+1));
    eigenvalues ≈ (jπ/L)², so L=20 m puts ~270 modes in the band. A small
    banded random symmetric perturbation widens the bandwidth to ``half``
    while keeping C and T safely SPD (Gershgorin margins checked by
    construction). Returns (c, t, wp): SciPy CSR matrices + dense ports.
    Use with the waveguide wave form: a0=c, a2=GAMMA_SCALE·t, t_a2=f².
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    h = length_m / (n + 1)
    # The in-band Helmholtz shift per low mode is ≈ h·k₀² (mass-matrix
    # scale times k₀² ∈ [3.9e3, 1.1e4] over 3–5 GHz). The perturbation and
    # its SPD Gershgorin margin must stay well BELOW that shift or the
    # margin re-definitizes A(f) and the "indefinite" claim is false
    # (a 0.08/h margin ≈ 137 vs a shift ≈ 4.5 did exactly that).
    shift_scale = h * (2 * np.pi * 4e9 / 299792458.0) ** 2  # mid-band
    pert = 0.02 * shift_scale
    margin = 2 * pert * sum(0.5 ** (d - 2) for d in range(2, half + 1))
    main_c = np.full(n, 2.0 / h + margin)
    off_c = np.full(n - 1, -1.0 / h)
    c = sp.diags([off_c, main_c, off_c], [-1, 0, 1], format="lil")
    main_t = np.full(n, 4.0 * h / 6.0)
    off_t = np.full(n - 1, h / 6.0)
    t = sp.diags([off_t, main_t, off_t], [-1, 0, 1], format="lil")
    # banded symmetric perturbations, geometrically damped with offset —
    # total off-diagonal mass stays below the diagonal margin (SPD kept)
    for d in range(2, half + 1):
        vc = rng.uniform(-1.0, 1.0, size=n - d) * pert * 0.5 ** (d - 2)
        c[np.arange(n - d), np.arange(d, n)] = vc
        c[np.arange(d, n), np.arange(n - d)] = vc
        vt = rng.uniform(-1.0, 1.0, size=n - d) * (0.02 * h / 6) * 0.5 ** (
            d - 2
        )
        t[np.arange(n - d), np.arange(d, n)] = vt
        t[np.arange(d, n), np.arange(n - d)] = vt
    wp = np.zeros((n, m))
    nnz = max(8, n // 1000)
    for j in range(m):
        rows = rng.choice(n, size=nnz, replace=False)
        wp[rows, j] = rng.uniform(0.5, 1.0, size=nnz)
    return c.tocsr(), t.tocsr(), wp


def banded_waveguide_system_2d(
    p: int,
    m: int = 2,
    seed: int = 0,
    side_m: float = 0.15,
):
    """2-D P1-FEM waveguide-cross-section Helmholtz pencil (N = p²).

    The reference's ~34k-DOF stress case is an upscaled version of the
    bundled 2-D waveguide FEM problem (fake_interpolate_bigger_sample.py:
    1-34); this generator builds the genuine article instead of a tiling:
    stiffness/mass of a p×p-interior-node square cross-section, Dirichlet
    walls. Row-major node ordering gives a BANDED pattern with
    half-bandwidth p+1 (stiffness: 5-point stencil; mass: 9-point
    tensor-product P1), the structure the RCM-banded matrix-free route
    (ops/block_tridiag.py) exists for.

    Why 2-D for the large-N benchmark and not `banded_waveguide_system`
    (1-D): refining a 1-D mesh at fixed length drives cond(A) ~ n² past
    what an f32 factorization + f64 refinement can recover (measured at
    n=34k/L=1 m: first snapshot stalls at 1e-2 relative residual), while
    shrinking the length to keep cond down packs hundreds of resonances
    into the 3-5 GHz band — more modes than any greedy budget. In 2-D,
    h = L/(p+1) with n = p², so cond(A) ~ 1/h² ~ n: at n≈34k that is
    ~1e5-1e6 (comfortably refinable) with ~10 in-band resonances at
    side_m=0.15 — the same physics regime as the bundled N=3411 problem.

    Returns (c, t, wp): SciPy CSR stiffness/mass + dense ports (a few
    point excitations per port, like WP.npy's 38 nonzeros). Use with the
    wave form a0=c, a2=GAMMA_SCALE·t, t_a2=f²; eigenfrequencies sit at
    k₀² = π²(j²+k²)/side² — ~10 inside the 3-5 GHz band by default.
    """
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    h = side_m / (p + 1)
    # 1-D P1 factors (scale-free stiffness, h-scaled consistent mass);
    # the 2-D P1 tensor-product operators are K⊗M + M⊗K and M⊗M
    k1 = sp.diags(
        [np.full(p - 1, -1.0), np.full(p, 2.0), np.full(p - 1, -1.0)],
        [-1, 0, 1],
    ) / h
    m1 = sp.diags(
        [np.full(p - 1, 1.0), np.full(p, 4.0), np.full(p - 1, 1.0)],
        [-1, 0, 1],
    ) * (h / 6.0)
    c = (sp.kron(k1, m1) + sp.kron(m1, k1)).tocsr()
    t = sp.kron(m1, m1).tocsr()
    n = p * p
    wp = np.zeros((n, m))
    nnz = max(8, n // 1000)
    for j in range(m):
        rows = rng.choice(n, size=nnz, replace=False)
        wp[rows, j] = rng.uniform(0.5, 1.0, size=nnz)
    return c, t, wp
