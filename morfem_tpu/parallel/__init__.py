"""Multi-device scaling: mesh construction and sharded execution paths."""

from morfem_tpu.parallel.mesh import factorize_mesh, make_mesh
from morfem_tpu.parallel.sharded import (
    batch_systems,
    multi_geometry_greedy,
    multi_geometry_mor,
    sharded_full_order_sweep,
    sharded_spectral_sweep,
    sharded_sweep,
    tp_operator_images_and_project,
)
from morfem_tpu.parallel.tp_dense import (
    tp_gj_apply,
    tp_gj_factor,
    tp_solve_dense,
    tp_solve_dense_compiled,
)
from morfem_tpu.parallel.tp_solve import tp_matvec_fn, tp_snapshot_basis, tp_solve

__all__ = [
    "factorize_mesh",
    "make_mesh",
    "batch_systems",
    "multi_geometry_greedy",
    "multi_geometry_mor",
    "sharded_full_order_sweep",
    "sharded_spectral_sweep",
    "sharded_sweep",
    "tp_operator_images_and_project",
    "tp_gj_apply",
    "tp_gj_factor",
    "tp_matvec_fn",
    "tp_snapshot_basis",
    "tp_solve",
    "tp_solve_dense",
    "tp_solve_dense_compiled",
]
