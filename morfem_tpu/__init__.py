"""morfem_tpu — TPU-native model order reduction for FEM frequency sweeps.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference library SzymonKnopp/morfem: fast frequency sweeps of parametric
affine systems

    (t_a0(t)·A0 + t_a1(t)·A1 + t_a2(t)·A2) · X = t_b(t) · B,   t ∈ domain

via Galerkin projection onto a snapshot basis (greedy, driven by an
algebraic residual-norm estimator, or equally distributed), with the whole
pipeline — snapshot LU solves, Gram-block estimation, orthonormalization,
projection, and the batched reduced sweep — running as compiled XLA/Pallas
programs on TPU, and scaling across chips via `jax.sharding` meshes.

Public API parity: `morfem()` keeps the reference's entry-point contract
(reference: implementation.py:99-186). The idiomatic API is
`AffineSystem` → `build_reduced_model()` → `ReducedModel.sweep()`.
"""

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.system import AffineSystem
from morfem_tpu.mor.api import morfem, build_reduced_model
from morfem_tpu.mor.reduced import ReducedModel, project, sweep
from morfem_tpu.mor.greedy import greedy_basis, GreedyResult
from morfem_tpu.mor.equally import equally_distributed_basis
from morfem_tpu.ops.block_tridiag import (
    banded_direct_solve,
    banded_via_rcm,
    rcm_direct_solve,
    shifted_gmres_solve,
)
from morfem_tpu.ops.spectral_solve import (
    FullOrderSpectral,
    prepare_spectral_full,
    spectral_full_sweep,
)
from morfem_tpu.mor.spectral import (
    SpectralModel,
    QuadraticSpectralModel,
    prepare_spectral,
    prepare_spectral_quadratic,
    spectral_sweep,
    spectral_sweep_quadratic,
)
from morfem_tpu.mor.estimator import (
    estimator_blocks,
    estimate_errors,
    estimate_errors_direct,
    operator_images,
)
from morfem_tpu.ops.solve import (
    solve_point,
    solve_batch,
    solve_sweep,
    solve_dense,
    lu_solve_refined,
    gj_solve_refined,
)
from morfem_tpu.ops.blocked_inverse import gj_inverse_f32
from morfem_tpu.ops.complex_split import (
    embed_affine_system,
    solve_complex,
    solve_complex_split,
    split_solution,
)
from morfem_tpu.mor.complex_model import sweep_complex_reduced
from morfem_tpu.mor.greedy_matfree import greedy_basis_matfree
from morfem_tpu.utils.timing import PhaseTimer
from morfem_tpu.utils.checkpoint import save_reduced_model, load_reduced_model

__version__ = "0.1.0"

__all__ = [
    "MorfemConfig",
    "DEFAULT_CONFIG",
    "AffineSystem",
    "ReducedModel",
    "morfem",
    "build_reduced_model",
    "project",
    "sweep",
    "greedy_basis",
    "GreedyResult",
    "equally_distributed_basis",
    "SpectralModel",
    "QuadraticSpectralModel",
    "banded_direct_solve",
    "banded_via_rcm",
    "rcm_direct_solve",
    "shifted_gmres_solve",
    "FullOrderSpectral",
    "prepare_spectral_full",
    "spectral_full_sweep",
    "prepare_spectral",
    "prepare_spectral_quadratic",
    "spectral_sweep",
    "spectral_sweep_quadratic",
    "estimator_blocks",
    "estimate_errors",
    "estimate_errors_direct",
    "operator_images",
    "solve_point",
    "solve_batch",
    "solve_sweep",
    "solve_dense",
    "lu_solve_refined",
    "gj_solve_refined",
    "gj_inverse_f32",
    "greedy_basis_matfree",
    "sweep_complex_reduced",
    "PhaseTimer",
    "save_reduced_model",
    "load_reduced_model",
]
