"""Device-mesh construction helpers.

The reference has no parallelism of any kind — the whole compute path is a
single-process Python loop (SURVEY.md §2.3). The TPU-native scaling axes of
this framework map onto a `jax.sharding.Mesh` as:

  * ``dp`` — data parallelism over independent MOR problems
    (multi-geometry parameter batches; BASELINE config 5),
  * ``sp`` — "sequence"-style parallelism over the frequency/domain axis
    (the reduced sweep is embarrassingly parallel over points),
  * ``tp`` — tensor parallelism over the FEM DOF axis N (sharded operator
    images and projection contractions with psum over ICI).

Pipeline (pp) and expert (ep) parallelism have no meaningful analogue in a
Galerkin-projection sweep (no layered stages, no routed experts) —
documented here so the disposition is explicit rather than absent.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1,
    sp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('dp', 'sp', 'tp') mesh over the given (or all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    need = dp * sp * tp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(dp, sp, tp)
    return Mesh(dev, axis_names=("dp", "sp", "tp"))


def factorize_mesh(n_devices: int) -> Tuple[int, int, int]:
    """Split n devices into a (dp, sp, tp) shape, preferring balance.

    Powers of two split evenly (8 → 2·2·2); otherwise the largest factor
    goes to dp (independent problems scale perfectly over DCN/ICI alike).
    """
    dp, sp, tp = 1, 1, 1
    rem = n_devices
    # peel factors of two round-robin onto tp, sp, dp
    order = ["tp", "sp", "dp"]
    i = 0
    while rem % 2 == 0 and rem > 1:
        if order[i % 3] == "tp":
            tp *= 2
        elif order[i % 3] == "sp":
            sp *= 2
        else:
            dp *= 2
        rem //= 2
        i += 1
    dp *= rem  # odd remainder → data parallelism
    return dp, sp, tp


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
