"""Sharded execution paths: tp projection, sp sweeps, dp geometry batches.

Everything here expresses the reference's serial loops (SURVEY.md §2.3 —
which has zero parallelism to port) as SPMD programs over a device mesh.
Collectives are XLA's (psum/all_gather over ICI) — no hand-rolled
communication backend, per the scaling-book recipe: annotate shardings, let
XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from morfem_tpu.config import MorfemConfig, DEFAULT_CONFIG
from morfem_tpu.mor.reduced import ReducedModel, assemble_reduced, solve_reduced_batch
from morfem_tpu.ops.orthonormalize import orthonormalize_svd
from morfem_tpu.ops.precision import precise_matmul
from morfem_tpu.ops.solve import solve_dense


# ---------------------------------------------------------------------------
# tp: tensor-parallel projection over the DOF axis N
# ---------------------------------------------------------------------------


def tp_operator_images_and_project(
    ops: Tuple[jax.Array, jax.Array, jax.Array],
    b: jax.Array,
    q: jax.Array,
    mesh: Mesh,
    axis: str = "tp",
):
    """U_p = A_p·Q and the Galerkin projections, N-axis sharded.

    Layout: A_p is sharded over rows ([N/tp, N] per device — the columns
    stay full so each device computes its row-block of U_p with a full
    local matmul), Q and B are sharded over the same row axis. The small
    contractions Qᴴ·U_p, Qᴴ·B reduce over N → one psum over the tp axis.

    Returns (u [3, N, K] row-sharded, r [3, K, K] replicated,
    b_r [K, M] replicated).
    """

    def local(a0_l, a1_l, a2_l, b_l, q_l, q_full):
        # a*_l: [N/tp, N]; q_l: [N/tp, K]; q_full: [N, K] (gathered once)
        u_l = jnp.stack([
            precise_matmul(a0_l, q_full),
            precise_matmul(a1_l, q_full),
            precise_matmul(a2_l, q_full),
        ])
        qt_l = q_l.T  # plain transpose (see mor/reduced.py docstring)
        r_part = jnp.einsum(
            "kn,pnl->pkl", qt_l, u_l,
            precision=jax.lax.Precision.HIGHEST,
        )
        br_part = precise_matmul(qt_l, b_l)
        r = jax.lax.psum(r_part, axis)
        b_r = jax.lax.psum(br_part, axis)
        return u_l, r, b_r

    def fn(a0, a1, a2, b, q):
        q_full = jax.lax.all_gather(q, axis, axis=0, tiled=True)
        return local(a0, a1, a2, b, q, q_full)

    row = P(axis, None)
    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(row, row, row, row, row),
        out_specs=(P(None, axis, None), P(), P()),
    )(ops[0], ops[1], ops[2], b, q)
    return out


# ---------------------------------------------------------------------------
# sp: frequency-axis sharded reduced sweep
# ---------------------------------------------------------------------------


def sharded_sweep(
    rm: ReducedModel,
    mesh: Mesh,
    config: MorfemConfig = DEFAULT_CONFIG,
    ts: Optional[jax.Array] = None,
    axis: str = "sp",
) -> jax.Array:
    """Reduced sweep with the domain axis sharded across the mesh.

    Each device assembles and LU-solves its slice of frequency points —
    zero communication (the reduced operators are replicated; they are
    K×K-small). Grids that do not divide the axis size are padded with
    the last point and trimmed afterwards (like `ops/solve.py`'s
    unsharded sweep).
    """
    if ts is None:
        ts = rm.domain
    sp = mesh.shape[axis]
    i_pts = ts.shape[0]
    pad = (-i_pts) % sp
    if pad:
        ts = jnp.concatenate([ts, jnp.broadcast_to(ts[-1:], (pad,))])
    ts = jax.lax.with_sharding_constraint(ts, NamedSharding(mesh, P(axis)))

    @jax.jit
    def run(rm, ts):
        a, rhs = assemble_reduced(rm, ts, config)
        a = jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(axis, None, None))
        )
        return solve_reduced_batch(a, rhs, config)

    return run(rm, ts)[:i_pts]


def sharded_spectral_sweep(
    sm,
    mesh: Mesh,
    ts: Optional[jax.Array] = None,
    axis: str = "sp",
) -> jax.Array:
    """Spectral (diagonalized) reduced sweep, domain axis sharded.

    Works for both `SpectralModel` and `QuadraticSpectralModel`
    (mor/spectral.py) — each point is an independent O(K·M) evaluation
    against replicated eigen-data, so the sweep is embarrassingly
    parallel over the ``sp`` axis, like `sharded_sweep`. Non-divisible
    grids are padded with the last point and trimmed afterwards.
    """
    if ts is None:
        ts = sm.rm.domain
    sp = mesh.shape[axis]
    i_pts = ts.shape[0]
    pad = (-i_pts) % sp
    if pad:
        ts = jnp.concatenate([ts, jnp.broadcast_to(ts[-1:], (pad,))])
    ts = jax.lax.with_sharding_constraint(ts, NamedSharding(mesh, P(axis)))

    @jax.jit
    def run(sm, ts):
        x = sm.sweep(ts)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis, None, None))
        )

    return run(sm, ts)[:i_pts]


def sharded_full_order_sweep(
    sys,
    mesh: Mesh,
    config: MorfemConfig = DEFAULT_CONFIG,
    axis: str = "sp",
) -> jax.Array:
    """FULL-ORDER sweep with the frequency axis sharded across the mesh.

    The no-MOR baseline (`ops/solve.py::solve_sweep`,
    reference implementation.py:189-194) scaled to multiple chips: each
    device assembles and factorizes its slice of the domain's N×N
    systems — the operators are replicated (read-only) and the points
    are independent, so the sweep is embarrassingly parallel and the
    wall time divides by the ``axis`` size. Non-divisible grids are
    padded with the last point and trimmed afterwards.

    Memory note: each device holds `solve_chunk` N×N factorizations at a
    time, same as the unsharded sweep; replicating the three operators
    costs 3·N² per device (the snapshots themselves dominate at the
    scales where this path applies).
    """
    from morfem_tpu.ops.solve import solve_sweep

    sp = mesh.shape[axis]
    i_pts = sys.num_points
    pad = (-i_pts) % sp
    dom = sys.domain
    if pad:
        dom = jnp.concatenate([dom, jnp.broadcast_to(dom[-1:], (pad,))])

    # explicit shard_map (not sharding constraints): each device runs the
    # whole chunked sweep on its local domain slice — the partitioning
    # does not depend on GSPMD propagating through the sweep's internal
    # reshape/lax.map. The system's operators ride in as replicated
    # closure constants.
    def local(dom_local):
        return solve_sweep(sys.with_domain(dom_local), config)

    run = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis, None, None),
        )
    )
    return run(dom)[:i_pts]


# ---------------------------------------------------------------------------
# dp: multi-geometry MOR batches
# ---------------------------------------------------------------------------


def batch_systems(systems) -> Tuple[jax.Array, ...]:
    """Stack same-shape AffineSystems into batched operator arrays."""
    a0 = jnp.stack([s.a0 for s in systems])
    a1 = jnp.stack([s.a1 for s in systems])
    a2 = jnp.stack([s.a2 for s in systems])
    b = jnp.stack([s.b for s in systems])
    domain = jnp.stack([s.domain for s in systems])
    return a0, a1, a2, b, domain


def multi_geometry_mor(
    a0: jax.Array,  # [G, N, N]
    a1: jax.Array,
    a2: jax.Array,
    b: jax.Array,  # [G, N, M]
    domain: jax.Array,  # [G, I]
    seed_indices: jax.Array,  # [S] static-length seed positions
    coeffs,  # (t_a0, t_a1, t_a2, t_b) traceable callables, shared
    config: MorfemConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Equally-distributed MOR for a batch of independent geometries.

    BASELINE config 5 ("multi-geometry parameter batch"): G independent
    systems run the full pipeline — batched snapshot solves, SVD
    orthonormalization, projection, reduced sweep — vmapped over the
    geometry axis. With a mesh, the geometry axis is dp-sharded and the
    operator N-axis tp-sharded via sharding constraints; XLA partitions
    the whole pipeline (GSPMD) with collectives only in the projection
    contractions.

    Returns (x [G, I, K, M] reduced solutions, q [G, N, K] bases).
    """
    t_a0, t_a1, t_a2, t_b = coeffs

    def one_geometry(a0g, a1g, a2g, bg, dom):
        ts = dom[seed_indices]
        c = jnp.stack(
            [
                jnp.broadcast_to(t_a0(ts), ts.shape),
                jnp.broadcast_to(t_a1(ts), ts.shape),
                jnp.broadcast_to(t_a2(ts), ts.shape),
            ],
            axis=-1,
        )
        cb = jnp.broadcast_to(t_b(ts), ts.shape)
        a_seed = (
            c[:, 0, None, None] * a0g
            + c[:, 1, None, None] * a1g
            + c[:, 2, None, None] * a2g
        )
        if config.symmetrize:
            a_seed = (a_seed + jnp.swapaxes(a_seed, -1, -2)) * 0.5
        rhs = cb[:, None, None] * bg
        snaps = jax.vmap(
            lambda a, r: solve_dense(a, r, config)
        )(a_seed, rhs)  # [S, N, M]
        q = orthonormalize_svd(
            jnp.moveaxis(snaps, 0, 1).reshape(a0g.shape[0], -1)
        )  # [N, S·M]
        qt = q.T  # plain transpose (see mor/reduced.py docstring)
        rm = ReducedModel(
            domain=dom,
            q=q,
            r0=precise_matmul(qt, precise_matmul(a0g, q)),
            r1=precise_matmul(qt, precise_matmul(a1g, q)),
            r2=precise_matmul(qt, precise_matmul(a2g, q)),
            b_r=precise_matmul(qt, bg),
            ncols=jnp.asarray(q.shape[1]),
            t_a0=t_a0,
            t_a1=t_a1,
            t_a2=t_a2,
            t_b=t_b,
        )
        a_red, rhs_red = assemble_reduced(rm, dom, config)
        x = solve_reduced_batch(a_red, rhs_red, config)
        return x, q

    vmapped = jax.vmap(one_geometry)
    if mesh is None:
        return jax.jit(vmapped)(a0, a1, a2, b, domain)

    gshard = NamedSharding(mesh, P("dp", "tp", None))

    def sharded_fn(a0, a1, a2, b, domain):
        a0 = jax.lax.with_sharding_constraint(a0, gshard)
        a1 = jax.lax.with_sharding_constraint(a1, gshard)
        a2 = jax.lax.with_sharding_constraint(a2, gshard)
        x, q = vmapped(a0, a1, a2, b, domain)
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("dp", "sp", None, None))
        )
        return x, q

    return jax.jit(sharded_fn)(a0, a1, a2, b, domain)


def multi_geometry_greedy(
    a0: jax.Array,  # [G, N, N]
    a1: jax.Array,
    a2: jax.Array,
    b: jax.Array,  # [G, N, M]
    domain: jax.Array,  # [G, I]
    coeffs,
    config: MorfemConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
):
    """GREEDY MOR for a batch of independent geometries — vmapped.

    The compiled greedy loop (padded basis + masks, mor/greedy.py) is
    vmappable as-is: under vmap the while_loop runs until every geometry's
    convergence flag is set, with already-converged lanes passing through
    the identity branch. Each geometry gets its own adaptive basis size
    (`result.ncols` per lane). With a mesh the geometry axis is
    dp-sharded. Returns the batched GreedyResult.
    """
    from morfem_tpu.mor.greedy import greedy_basis
    from morfem_tpu.system import AffineSystem

    t_a0, t_a1, t_a2, t_b = coeffs

    def one(dom, a0g, a1g, a2g, bg):
        sys = AffineSystem(dom, a0g, a1g, a2g, bg, t_a0, t_a1, t_a2, t_b)
        return greedy_basis(sys, config)

    fn = jax.vmap(one)
    if mesh is None:
        return jax.jit(fn)(domain, a0, a1, a2, b)

    gshard = NamedSharding(mesh, P("dp", "tp", None))

    def sharded(domain, a0, a1, a2, b):
        a0 = jax.lax.with_sharding_constraint(a0, gshard)
        a1 = jax.lax.with_sharding_constraint(a1, gshard)
        a2 = jax.lax.with_sharding_constraint(a2, gshard)
        return fn(domain, a0, a1, a2, b)

    return jax.jit(sharded)(domain, a0, a1, a2, b)
