"""Shared helpers for the benchmark scripts: results.jsonl recording, the
persistent compile cache, and the canonical BASELINE configs[1] pendulum
problem (so the scripts cannot drift apart)."""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

RESULTS = os.path.join(_ROOT, "benchmarks", "results.jsonl")


def setup_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def record(metric: str, ms: float | None = None, **kw):
    row = {"metric": metric, "t": time.strftime("%Y-%m-%d %H:%M:%S"), **kw}
    if ms is not None:
        row["ms"] = round(ms, 4)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return row


def pendulum_problem(horizon: int, second_order: bool = False, dtype=None):
    """BASELINE configs[1] problem: pendulum swing-up to q=3.14, terminal
    config constraint through a double advance_time."""
    import jax.numpy as jnp

    from ddp_tpu.models.pendulum import pendulum
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem

    dtype = dtype or jnp.float32
    model = pendulum(1.0, 1.0, dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model, target=jnp.asarray([3.14], dtype=dtype), active_ts=(horizon,)
        ),
        dyn,
        times=2,
    )
    return Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=horizon,
        second_order=second_order,
    )
