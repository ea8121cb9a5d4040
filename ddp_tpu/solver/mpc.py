"""Receding-horizon MPC driver with warm starts.

The reference has no MPC loop (its drivers solve once and print); BASELINE
configs[5] requires "multi-host receding-horizon MPC … 10 ms replan budget".
TPU discipline for that budget: compile once, execute many — a single jitted
``step`` advances the warm start, re-solves with a fixed (small) iteration
budget, and returns the first control + feedback gains.  No host round-trips
inside the loop; the whole step vmaps over scenario batches and shards over
a mesh (see parallel/mesh.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ddp_tpu.solver.batched import solve_batched
from ddp_tpu.solver.solve import Method, SolverParams


class MPCCarry(NamedTuple):
    """Warm-start state carried between replans."""

    us_warm: jax.Array  # [T, nu]


class MPCStep(NamedTuple):
    u0: jax.Array  # [nu]      control to apply now
    k0: jax.Array  # [nu]      feedforward at t=0
    K0: jax.Array  # [nu, ndx] feedback gain at t=0 (for inter-replan control)
    carry: MPCCarry
    opt_constr: jax.Array


def make_mpc_step(
    problem,
    params: SolverParams,
    method=Method.PRIMAL_DUAL_AFFINE,
    unroll: int = 4,
    backward: str = "sweep",
):
    """Build the jitted replan function: (x_measured, carry) → MPCStep.

    Uses the static-control-flow batched solver internals on a single
    sample so the compiled program has a deterministic 10 ms-class runtime
    (no data-dependent loops).
    """

    def step(x_measured: jax.Array, carry: MPCCarry) -> MPCStep:
        res = solve_batched(
            problem,
            params,
            x_measured[None],
            us_init=carry.us_warm[None],
            method=method,
            unroll=unroll,
            backward=backward,
        )
        us = res.us[0]
        # shift warm start: drop u_0, repeat the tail control
        us_warm = jnp.concatenate([us[1:], us[-1:]], axis=0)
        return MPCStep(
            u0=us[0],
            k0=res.fb_k[0, 0],
            K0=res.fb_K[0, 0],
            carry=MPCCarry(us_warm=us_warm),
            opt_constr=res.opt_constr[0],
        )

    return jax.jit(step)


def init_carry(problem, dtype=None) -> MPCCarry:
    dtype = dtype or jnp.float32
    return MPCCarry(us_warm=jnp.zeros((problem.horizon, problem.nu), dtype=dtype))


def make_batch_mpc_step(
    problem,
    params: SolverParams,
    mesh,
    method=Method.PRIMAL_DUAL_AFFINE,
    unroll: int = 1,
    backward: str = "sweep",
):
    """Fleet MPC: replan a batch of scenarios sharded over a device mesh.

    BASELINE configs[5]: "multi-host receding-horizon MPC: 32k scenarios
    across N hosts, 10 ms replan budget".  Returns a jitted
    fn(x_measured [B, nx], us_warm [B, T, nu]) → (u0 [B, nu], us_warm',
    mean_constr) with the batch axis sharded and the convergence aggregate
    psum-reduced over the mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard_fn(x, us_warm):
        res = solve_batched(
            problem, params, x, us_init=us_warm, method=method, unroll=unroll,
            backward=backward,
        )
        us_next = jnp.concatenate([res.us[:, 1:], res.us[:, -1:]], axis=1)
        n_total = jax.lax.psum(x.shape[0], "batch")
        mean_constr = jax.lax.psum(jnp.sum(res.opt_constr), "batch") / n_total
        return res.us[:, 0], us_next, mean_constr

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("batch"), P("batch")),
        out_specs=(P("batch"), P("batch"), P()),
        check_vma=False,
    )
    x_shard = NamedSharding(mesh, P("batch"))
    return jax.jit(shard, in_shardings=(x_shard, x_shard))


def run_mpc(
    problem,
    params: SolverParams,
    x0: jax.Array,
    n_steps: int,
    plant=None,
    method=Method.PRIMAL_DUAL_AFFINE,
):
    """Closed-loop rollout: replan at every step, apply u0 to the plant
    (defaults to the problem's own dynamics), entirely on-device via scan."""
    plant = plant or problem.dynamics

    def body(state, t):
        x, carry = state
        out = make_step_inner(x, carry)
        x_next = plant(t, x, out.u0)
        return (x_next, out.carry), (x, out.u0, out.opt_constr)

    make_step_inner = lambda x, c: _step_impl(problem, params, method, x, c)
    carry0 = MPCCarry(us_warm=jnp.zeros((problem.horizon, problem.nu), dtype=x0.dtype))
    (x_end, _), (xs, us, ocs) = jax.lax.scan(
        body, (x0, carry0), jnp.arange(n_steps)
    )
    return jnp.concatenate([xs, x_end[None]]), us, ocs


def _step_impl(problem, params, method, x_measured, carry):
    res = solve_batched(
        problem, params, x_measured[None], us_init=carry.us_warm[None], method=method
    )
    us = res.us[0]
    us_warm = jnp.concatenate([us[1:], us[-1:]], axis=0)
    return MPCStep(
        u0=us[0],
        k0=res.fb_k[0, 0],
        K0=res.fb_K[0, 0],
        carry=MPCCarry(us_warm=us_warm),
        opt_constr=res.opt_constr[0],
    )
