"""Gram-block utilities.

The reference's USE_OPM optimization maintains the 16 estimator Gram
blocks incrementally: when the basis grows from Q to [Q, Q_new], each
block Qᴴ·M·Q is reconstructed as a 2×2 block matrix without recomputing
the original (``expand_matrix``, implementation.py:455-465).

In this framework the incremental machinery is OBSOLETE on the hot path:
the estimator computes all blocks from the operator images U_p = A_p·Q,
whose recomputation is three MXU matmuls — cheaper than the reference's
increments (see `morfem_tpu.mor.estimator`). The expansion identity is
kept here for completeness (it is occasionally useful for host-side
analysis of growing bases) and as the documented disposition of the
reference component.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from morfem_tpu.ops.precision import precise_matmul


def hermitian(a: jax.Array) -> jax.Array:
    """Hermitian conjugate — counterpart of `h` (implementation.py:483-488).

    The reference raises on non-2D input; here standard JAX batching
    semantics apply instead (the last two axes are transposed).
    """
    if a.ndim < 2:
        raise ValueError("array has to be at least two-dimensional")
    return jnp.swapaxes(a.conj(), -1, -2)


def expand_gram_matrix(
    original: jax.Array,
    old_q: jax.Array,
    middle: jax.Array,
    new_q: jax.Array,
) -> jax.Array:
    """Grow Qᴴ·M·Q to [Q, Q_new]ᴴ·M·[Q, Q_new] without recomputing it.

    Block reconstruction (reference: implementation.py:455-465):

        [ original             old_qᴴ·M·new_q ]
        [ new_qᴴ·M·old_q       new_qᴴ·M·new_q ]
    """
    top_right = precise_matmul(hermitian(old_q), precise_matmul(middle, new_q))
    bottom_left = precise_matmul(hermitian(new_q), precise_matmul(middle, old_q))
    bottom_right = precise_matmul(hermitian(new_q), precise_matmul(middle, new_q))
    top = jnp.concatenate([original, top_right], axis=1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=1)
    return jnp.concatenate([top, bottom], axis=0)
