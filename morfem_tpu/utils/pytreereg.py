"""Pytree registration for matrix-free operator classes.

The large-N operators (BCOO / banded / block-sparse / ELL) hold their
storage as instance attributes. A jitted function that merely CLOSES over
such an operator embeds every buffer as an HLO *constant* — which XLA
re-uploads with each compile request. On the remote-compile TPU backend
this inflates the request body past the service limit (HTTP 413 at
N=9000, observed round 3) and defeats compile caching across operators
of equal shape. Registering the classes as pytrees lets callers pass the
operator through the jit boundary as an *argument* instead: buffers
become parameters, the trace is shared across same-shaped systems, and
the compile request stays small.

`register_operator_pytree(cls, data_fields, static_fields)` flattens the
named `data_fields` (arrays / nested pytrees, traced) and carries
`static_fields` (shapes, flags, tile sizes) as hashable aux data that
keys the jit cache. Unflattening bypasses ``__init__`` (which does host
SciPy work) via ``object.__new__``.
"""

from __future__ import annotations

from typing import Sequence

import jax


def register_operator_pytree(
    cls, data_fields: Sequence[str], static_fields: Sequence[str]
) -> None:
    data_fields = tuple(data_fields)
    static_fields = tuple(static_fields)

    def flatten(op):
        children = tuple(getattr(op, f) for f in data_fields)
        aux = tuple(getattr(op, f) for f in static_fields)
        return children, aux

    def unflatten(aux, children):
        op = object.__new__(cls)
        for f, v in zip(data_fields, children):
            object.__setattr__(op, f, v)
        for f, v in zip(static_fields, aux):
            object.__setattr__(op, f, v)
        return op

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
