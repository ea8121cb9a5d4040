"""Weak-scaling check of the batch-sharded solve on a virtual device mesh.

BASELINE configs[4] calls for ≥80% scaling efficiency at 2 hosts with 32k
scenarios.  Real multi-host hardware is not available in this environment
(one TPU chip), so this script measures weak scaling across a virtual CPU
mesh (1 → N devices, fixed per-device batch): the sharding/collective code
path is identical to a pod run — shard_map over a ("batch",) mesh with psum
reductions — only the interconnect differs.

Prints one JSON line per mesh size with solves/s and efficiency vs 1 device.

Interpretation on this 2-core dev box: virtual devices multiplex the same
physical cores, so total solves/s stays ~flat as the mesh grows — the right
signal here is that adding mesh shards costs ~nothing (sharding/collective
overhead ≈ 0), not the efficiency column itself.  On a real pod slice each
mesh element is its own chip and the same code path weak-scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = int(os.environ.get("MESH_DEVICES", "8"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEVICES}"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.parallel.mesh import batch_sharded_solve
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    H = 16
    per_device = int(os.environ.get("PER_DEVICE_BATCH", "64"))
    model = pendulum(1.0, 1.0, dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model, target=jnp.asarray([3.14], dtype=dtype), active_ts=(H,)
        ),
        dyn,
        times=2,
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=H,
        second_order=False,
    )
    params = SolverParams(max_iterations=6, threshold=1e-5, mu=1e4)

    base_rate = None
    for nd in (1, 2, 4, N_DEVICES):
        mesh = jax.make_mesh((nd,), ("batch",), devices=jax.devices()[:nd])
        fn = batch_sharded_solve(problem, params, mesh)
        B = nd * per_device
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(
            np.stack([rng.uniform(-np.pi, np.pi, B), np.zeros(B)], axis=1), dtype
        )
        us, stats = fn(x0s)
        jax.block_until_ready(us)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            us, stats = fn(x0s)
            jax.block_until_ready(us)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        rate = B / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(
            json.dumps(
                {
                    "devices": nd,
                    "batch": B,
                    "solves_per_s": round(rate, 1),
                    "weak_scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
