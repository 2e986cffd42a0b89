"""The parametric affine system definition.

TPU-native counterpart of the reference's ``ModelDefinition`` container
(reference: implementation.py:19-54): the problem

    (t_a0(t)·A0 + t_a1(t)·A1 + t_a2(t)·A2) · X = t_b(t) · B     for t ∈ domain

Differences from the reference, by design:

* ``AffineSystem`` is an immutable, registered JAX pytree — it flows through
  `jit`/`vmap`/`shard_map` directly. The reference mutates its container in
  place (implementation.py:179-184 aliases ``md_r = md`` and overwrites the
  full-order operators with the reduced ones); here reduction produces a new
  ``ReducedModel`` object and never touches the full-order system.
* Operators are stored dense. The reference stores SciPy CSC
  (implementation.py:23-27) because its solver is a sparse direct `splu`; on
  TPU the snapshot solves run as dense LU on the MXU, where a dense layout is
  strictly faster for the N≈3.4k–30k range this library targets. A BCOO
  sparse path exists for the very-large-N iterative solver
  (`morfem_tpu.ops.sparse`).
* Coefficient callables must be JAX-traceable elementwise functions; they are
  evaluated on the whole domain vector at once (shape [I]) instead of per
  scalar point in a Python loop (reference: implementation.py:417-420).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Coefficient = Callable[[jax.Array], jax.Array]


def _default_t_a0(t):
    # reference: implementation.py:105 — t -> 1
    return jnp.ones_like(t)


def _default_t_a1(t):
    # reference: implementation.py:106 — t -> t
    return t


def _default_t_a2(t):
    # reference: implementation.py:107 — t -> t**2
    return t**2


def _default_t_b(t):
    # reference: implementation.py:108 — t -> t
    return t


def _host_symmetric(x) -> bool:
    """Exact host-side symmetry check; False for device arrays/tracers.

    numpy arrays (and array-likes) compare in ~30 ms at N=3411; SciPy
    sparse via the structural (x != x.T).nnz == 0. jax Arrays would need
    a device round trip (or worse, eager remote-compiled comparisons) —
    not worth it for an optimization hint, so they conservatively
    return False.
    """
    try:
        if hasattr(x, "nnz") and hasattr(x, "T"):  # SciPy sparse
            return (x != x.T).nnz == 0
        if isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
            return False
        xh = np.asarray(x)
        return (
            xh.ndim == 2
            and xh.shape[0] == xh.shape[1]
            and np.array_equal(xh, xh.T)
        )
    except Exception:
        return False


def _as_dense(a, dtype=None):
    """Accept numpy / jnp arrays, SciPy sparse, or JAX BCOO; return jnp dense."""
    if a is None:
        return None
    if hasattr(a, "todense"):  # SciPy sparse (csc_array etc.)
        a = np.asarray(a.todense())
    elif hasattr(a, "todense_"):  # pragma: no cover - defensive
        a = np.asarray(a.todense_())
    try:  # JAX experimental sparse BCOO
        from jax.experimental import sparse as jsparse

        if isinstance(a, jsparse.BCOO):
            a = a.todense()
    except ImportError:  # pragma: no cover
        pass
    return jnp.asarray(a, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AffineSystem:
    """Immutable parametric affine system (pytree).

    Fields ``a0, a1, a2`` are the [N, N] system-matrix addends, ``b`` the
    [N, M] impulse-vector part, ``domain`` the [I] grid of parameter points.
    The four coefficient callables are static pytree metadata.
    """

    domain: jax.Array
    a0: jax.Array
    a1: jax.Array
    a2: jax.Array
    b: jax.Array
    t_a0: Coefficient = dataclasses.field(
        default=_default_t_a0, metadata=dict(static=True)
    )
    t_a1: Coefficient = dataclasses.field(
        default=_default_t_a1, metadata=dict(static=True)
    )
    t_a2: Coefficient = dataclasses.field(
        default=_default_t_a2, metadata=dict(static=True)
    )
    t_b: Coefficient = dataclasses.field(
        default=_default_t_b, metadata=dict(static=True)
    )
    # True when a0/a1/a2 were verified EXACTLY symmetric at construction.
    # Then the reference's symmetrization (A+Aᵀ)/2 (implementation.py:528)
    # is a bit-exact no-op ((x+x)/2 == x in IEEE), and the compute paths
    # skip it: assembly drops the transpose-add, and the greedy shares ONE
    # hoisted Ozaki operand split between the estimator (raw semantics)
    # and the snapshot-solve refinement (assembled/symmetrized semantics)
    # instead of two — a cold-compile and HBM saving (r4 verdict #3).
    symmetric_ops: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    # -- construction -----------------------------------------------------

    @staticmethod
    def create(
        domain,
        a0,
        a1,
        a2,
        b,
        t_a0: Coefficient = _default_t_a0,
        t_a1: Coefficient = _default_t_a1,
        t_a2: Coefficient = _default_t_a2,
        t_b: Coefficient = _default_t_b,
        dtype=None,
    ) -> "AffineSystem":
        """Build an AffineSystem from any array-ish operator inputs.

        Mirrors the reference constructor signature and defaults
        (implementation.py:99-108: t_a0=1, t_a1=t, t_a2=t², t_b=t).
        """
        # Exact-symmetry probe, STRICTLY ON THE HOST and BEFORE device
        # conversion: a device-side `jnp.all(a == a.T)` at N=3411 measured
        # 138 s of eager remote-compiles + transfers over the axon tunnel
        # (round 5) — for a hint whose host check costs ~30 ms. Inputs
        # that are already device arrays (or tracers) skip the probe: the
        # hint defaults off, which is always safe (see `symmetric_ops`).
        symmetric = all(
            _host_symmetric(x) for x in (a0, a1, a2)
        )
        domain = jnp.asarray(domain, dtype=dtype)
        a0 = _as_dense(a0, dtype)
        a1 = _as_dense(a1, dtype)
        a2 = _as_dense(a2, dtype)
        b = _as_dense(b, dtype)
        n = a0.shape[0]
        if a0.shape != (n, n) or a1.shape != (n, n) or a2.shape != (n, n):
            raise ValueError(
                f"a0/a1/a2 must be square and same shape, got "
                f"{a0.shape}, {a1.shape}, {a2.shape}"
            )
        if b.ndim == 1:
            b = b[:, None]
        if b.shape[0] != n:
            raise ValueError(f"b must have {n} rows, got {b.shape}")
        return AffineSystem(
            domain, a0, a1, a2, b, t_a0, t_a1, t_a2, t_b,
            symmetric_ops=symmetric,
        )

    # -- basic properties ---------------------------------------------------

    @property
    def n(self) -> int:
        """Number of degrees of freedom N."""
        return self.a0.shape[0]

    @property
    def m(self) -> int:
        """Number of right-hand sides (ports) M."""
        return self.b.shape[1]

    @property
    def num_points(self) -> int:
        """Number of domain points I."""
        return self.domain.shape[0]

    @property
    def dtype(self):
        return self.a0.dtype

    def coefficients(self, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Evaluate all coefficient functions on a vector (or scalar) of points.

        Returns ``(c, cb)`` where ``c[..., i]`` is the coefficient of ``a_i``
        and ``cb`` the coefficient of ``b`` — the whole domain at once, in one
        fused elementwise computation (vs. the reference's per-point Python
        calls, implementation.py:417-420).
        """
        t = jnp.asarray(t)
        ones = jnp.ones_like(t)
        c = jnp.stack(
            [
                jnp.broadcast_to(self.t_a0(t), t.shape) * ones,
                jnp.broadcast_to(self.t_a1(t), t.shape) * ones,
                jnp.broadcast_to(self.t_a2(t), t.shape) * ones,
            ],
            axis=-1,
        )
        cb = jnp.broadcast_to(self.t_b(t), t.shape)
        return c, cb

    def operators(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return (self.a0, self.a1, self.a2)

    def with_domain(self, domain) -> "AffineSystem":
        return dataclasses.replace(self, domain=jnp.asarray(domain))
