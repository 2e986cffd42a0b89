"""Multi-device scaling: mesh construction and sharded execution paths."""

from morfem_tpu.parallel.mesh import factorize_mesh, make_mesh
from morfem_tpu.parallel.sharded import (
    batch_systems,
    multi_geometry_mor,
    sharded_sweep,
    tp_operator_images_and_project,
)

__all__ = [
    "factorize_mesh",
    "make_mesh",
    "batch_systems",
    "multi_geometry_mor",
    "sharded_sweep",
    "tp_operator_images_and_project",
]
