"""Multi-host (multi-process) smoke test over DCN-style process meshes.

The round-2 review noted the multi-host story was untested: every sharded
path runs on a single-process mesh. This script validates the DCN layer
without multi-host hardware by launching TWO local CPU processes with
`jax.distributed.initialize` (process 0 is the coordinator), building a
global 2×(devices/process) mesh whose 'dp' axis spans the PROCESS
boundary, and running `multi_geometry_mor` over it — the config-5
multi-geometry batch whose geometry axis is the one meant to ride DCN.

Each process checks:
  * the global mesh spans both processes;
  * the dp-sharded pipeline compiles and executes (GSPMD inserts the
    cross-process collectives);
  * its locally-addressable result shards are finite AND match a
    serial single-process reference run of the same geometry lane.

Run:  python tools/multihost_smoke.py
      exits 0 and prints "multihost smoke OK" on success.

Not part of the pytest suite: it spawns processes and binds ports, which
is hostile to parallel test runners — run it directly.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PORT = int(os.environ.get("MULTIHOST_SMOKE_PORT", "8476"))
PER_PROC = 4  # virtual CPU devices per process


def worker(proc_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=proc_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from morfem_tpu import AffineSystem, MorfemConfig
    from morfem_tpu.parallel.sharded import batch_systems, multi_geometry_mor
    from morfem_tpu.utils.synthetic import random_affine_system

    devices = np.asarray(jax.devices())
    assert len({d.process_index for d in devices}) == 2, (
        "mesh does not span both processes"
    )
    # dp spans the process (DCN) boundary; sp/tp stay within a process (ICI)
    mesh = Mesh(devices.reshape(2, 1, PER_PROC), ("dp", "sp", "tp"))

    g, n, i_pts, m = 4, 32, 8, 2
    keys = jax.random.split(jax.random.PRNGKey(0), g)
    systems = []
    for key in keys:
        domain, a0, a1, a2, b = random_affine_system(
            key, n=n, m=m, num_points=i_pts
        )
        systems.append(AffineSystem.create(domain, a0, a1, a2, b))
    a0s, a1s, a2s, bs, doms = batch_systems(systems)
    seed_idx = jnp.asarray([0, i_pts - 1])
    coeffs = (
        systems[0].t_a0, systems[0].t_a1, systems[0].t_a2, systems[0].t_b
    )
    cfg = MorfemConfig(factor_dtype_name="float64", refine_iterations=0)
    x, q = multi_geometry_mor(
        a0s, a1s, a2s, bs, doms, seed_idx, coeffs, cfg, mesh=mesh
    )
    jax.block_until_ready(x)

    # align q with x's dp sharding so local shards pair up by lane
    dp_sh = NamedSharding(mesh, P("dp", None, None))
    q_dp = jax.jit(
        lambda q: jax.lax.with_sharding_constraint(q, dp_sh),
        out_shardings=dp_sh,
    )(q)
    x_dp = jax.jit(
        lambda x: x,
        out_shardings=NamedSharding(mesh, P("dp", None, None, None)),
    )(x)
    q_local = {
        (s.index[0].start or 0): np.asarray(s.data)
        for s in q_dp.addressable_shards
    }
    checked = 0
    for shard in x_dp.addressable_shards:
        vals = np.asarray(shard.data)
        assert np.isfinite(vals).all(), "non-finite local shard"
        g0 = shard.index[0].start or 0
        qg = q_local[g0]
        for lane in range(vals.shape[0]):
            gi = g0 + lane
            # serial single-process reference for this geometry lane
            xr, qr = multi_geometry_mor(
                a0s[gi:gi + 1], a1s[gi:gi + 1], a2s[gi:gi + 1],
                bs[gi:gi + 1], doms[gi:gi + 1], seed_idx, coeffs, cfg,
                mesh=None,
            )
            rec_ref = np.einsum(
                "nk,ikm->inm", np.asarray(qr[0]), np.asarray(xr[0])
            )
            rec_dist = np.einsum("nk,ikm->inm", qg[lane], vals[lane])
            err = np.linalg.norm(rec_dist - rec_ref) / np.linalg.norm(rec_ref)
            assert err < 1e-9, f"lane {gi} mismatch: {err:.2e}"
            checked += 1
    print(f"[proc {proc_id}] {checked} local lanes match serial reference",
          flush=True)
    jax.distributed.shutdown()


def main() -> int:
    if "MULTIHOST_SMOKE_ROLE" in os.environ:
        worker(int(os.environ["MULTIHOST_SMOKE_ROLE"]))
        return 0
    procs = []
    for pid in (0, 1):
        env = dict(os.environ, MULTIHOST_SMOKE_ROLE=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    rcs, outs = [], []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=300))
            outs.append(p.stdout.read().decode())
    except BaseException:
        for p in procs:
            p.kill()
        raise
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        if rc != 0:
            print(f"process {pid} failed (rc={rc}):\n{out}")
            return 1
    for out in outs:
        print(out, end="")
    print("multihost smoke OK: 2 processes x "
          f"{PER_PROC} devices, dp across the process boundary")
    return 0


if __name__ == "__main__":
    sys.exit(main())
