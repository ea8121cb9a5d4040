"""Device-only MPC replan latency, measured from a jax.profiler trace
(round-2 VERDICT item 5: "measure, don't subtract").

BASELINE configs[5] / north_star asks for <10 ms p50 replan on the arm MPC.
Round 1 evidenced this only indirectly: blocking wall p99 was 49 ms (the
axon tunnel's ~28 ms dispatch floor dominates) and the ~4 ms device claim
was derived by subtraction.  This script records the real number: it traces
N blocking UR5 replans (make_mpc_step, T=16, 3 AL iterations — the MPC
budget config) and reads the per-execution duration of the replan module
off the TPU plane's "XLA Modules" line, where each event is one on-device
executable run.

Run SOLO (the tunnel serializes TPU clients; a concurrent client would not
change device durations, but keep captures clean).
"""

from __future__ import annotations

import glob
import os
import tempfile

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

H = 16
ITERS = 3
# enough executions for a stable p50/p99 of a deterministic static program;
# kept small because the tunnel transfers the whole device trace (~10s+ per
# traced replan when the profiler link is slow)
N_REPLANS = 12


def trace_module_durations_ms(trace_dir: str) -> dict[str, list[float]]:
    """Parse the xplane proto: {module_name: [duration_ms per execution]}
    from the TPU device plane's "XLA Modules" line."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane.pb under {trace_dir}"
    pd = jax.profiler.ProfileData.from_file(files[0])
    out: dict[str, list[float]] = {}
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                out.setdefault(ev.name, []).append((ev.end_ns - ev.start_ns) / 1e6)
    return out


def main():
    from ddp_tpu.models import base
    from ddp_tpu.models.robots import ur5
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.mpc import init_carry, make_mpc_step
    from ddp_tpu.solver.solve import SolverParams

    dtype = jnp.float32
    arm = ur5(dtype=dtype)
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_target = arm.integrate(q0, jnp.asarray(0.05 * np.arange(1.0, 7.0), dtype))
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_target, active_ts=(H,)),
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
    params = SolverParams(
        max_iterations=ITERS, threshold=1e-5, mu=1e4, inner_iters_max=1
    )
    import sys

    # --forward seq: early-exit line-search ladder — the warm-started replan
    # accepts step 1 after the first solve, so the ladder does ~1 RNEA
    # rollout instead of n_linesearch (docs/DESIGN.md round-3 forward note)
    fwd = "seq" if "--forward=seq" in sys.argv else "sweep"
    step = make_mpc_step(problem, params, forward=fwd)
    x0 = base.state_pack(q0, jnp.zeros(arm.nv, dtype))
    carry = init_carry(problem, dtype)

    # compile + settle
    out = step(x0, carry)
    jax.block_until_ready(out.u0)
    carry = out.carry

    trace_dir = tempfile.mkdtemp(prefix="mpc-trace-")
    with jax.profiler.trace(trace_dir):
        for _ in range(N_REPLANS):
            out = step(x0, carry)
            jax.block_until_ready(out.u0)
            carry = out.carry

    mods = trace_module_durations_ms(trace_dir)
    # the replan module is the one executed N_REPLANS times (tiny helper
    # modules — percentile, convert — run once or not at all on device)
    name, durs = max(mods.items(), key=lambda kv: len(kv[1]))
    durs = np.asarray(sorted(durs))
    record(
        "ur5_mpc_replan_device_time",
        module=name,
        forward=fwd,
        n=len(durs),
        H=H,
        iters=ITERS,
        p50_ms=round(float(np.percentile(durs, 50)), 3),
        p99_ms=round(float(np.percentile(durs, 99)), 3),
        mean_ms=round(float(durs.mean()), 3),
        source="jax.profiler XLA Modules events (device plane)",
    )
    others = {k: len(v) for k, v in mods.items() if k != name}
    if others:
        print("other device modules:", others)


if __name__ == "__main__":
    main()
