"""Parity: the one-launch whole-solve kernel (kernels/flat_solve.py) vs
solve_batched's static flow — same gates, same accepted steps, same
multiplier schedule state.  f64 interpret mode on CPU (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.models.pendulum import pendulum
from ddp_tpu.ocp import constraints, costs, dynamics
from ddp_tpu.ocp.problem import Problem
from ddp_tpu.solver.batched import solve_batched
from ddp_tpu.solver.solve import SolverParams
from ddp_tpu.kernels.flat_solve import solve_flat_pallas


def _problem(H, dtype, target=1.0):
    model = pendulum(dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model, target=jnp.asarray([target], dtype), active_ts=(H,)
        ),
        dyn,
        times=2,
    )
    return Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=H,
        second_order=False,
    )


@pytest.mark.slow  # whole-solve kernel trace is minutes even at tiny dims
def test_flat_solve_kernel_matches_solve_batched():
    dtype = jnp.float64
    H = 6
    problem = _problem(H, dtype)
    params = SolverParams(
        max_iterations=3, threshold=1e-9, mu=1e4, inner_iters_max=1
    )
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-0.5, 0.5, 8), np.zeros(8)], axis=1), dtype
    )
    r_ref = solve_batched(problem, params, x0s, n_reg_levels=1, n_linesearch=8)
    r_k = solve_flat_pallas(problem, params, x0s, interpret=True)
    for name in ("us", "xs", "fb_k", "fb_K", "opt_constr", "opt_lag",
                 "mu", "reg", "w", "n"):  # fmt: skip
        a, b = getattr(r_k, name), getattr(r_ref, name)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-11, err_msg=name
        )
    np.testing.assert_allclose(
        np.asarray(r_k.mults.val), np.asarray(r_ref.mults.val), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(r_k.mults.jac), np.asarray(r_ref.mults.jac), atol=1e-11
    )


def test_flat_solve_kernel_gates():
    problem = _problem(4, jnp.float32)
    params = SolverParams(max_iterations=2, threshold=1e-6, mu=1e4)
    x0s = jnp.zeros((4, 2), jnp.float32)
    problem2 = Problem(
        dynamics=problem.dynamics, cost=problem.cost,
        constraint=problem.constraint, horizon=4, second_order=True,
    )  # fmt: skip
    with pytest.raises(ValueError, match="Gauss-Newton"):
        solve_flat_pallas(problem2, params, x0s, interpret=True)
