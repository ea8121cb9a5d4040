"""Model-zoo smoke + physics tests: 7-DoF arm, cartpole, acrobot, quadrotor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.models import base
from ddp_tpu.models.robots import acrobot, cartpole, panda7, quadrotor
from ddp_tpu.ocp import constraints, costs, dynamics
from ddp_tpu.ocp.problem import Problem
from ddp_tpu.solver.solve import SolverParams, solve


@pytest.mark.parametrize("ctor,nv", [(panda7, 7), (cartpole, 2), (acrobot, 2), (quadrotor, 6)])
def test_dynamics_identities(ctor, nv):
    m = ctor()
    assert m.nv == nv
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q = m.random_configuration(k1)
    v = 0.5 * jax.random.normal(k2, (m.nv,), jnp.float64)
    tau = jax.random.normal(k3, (m.nv,), jnp.float64)
    a = m.forward_dynamics(q, v, tau)
    np.testing.assert_allclose(np.asarray(m.rnea(q, v, a)), np.asarray(tau), atol=1e-8)
    M = np.asarray(m.mass_matrix(q))
    assert np.all(np.linalg.eigvalsh(0.5 * (M + M.T)) > 0)


def test_quadrotor_freefall():
    """Unforced quadrotor accelerates at −g in the world z direction."""
    m = quadrotor()
    q = m.neutral_configuration()
    a = m.forward_dynamics(q, jnp.zeros(6), jnp.zeros(6))
    # tangent layout (v_lin_local, ω_local); at neutral orientation local==world
    np.testing.assert_allclose(np.asarray(a[:3]), [0.0, 0.0, -9.81], atol=1e-10)
    np.testing.assert_allclose(np.asarray(a[3:]), 0.0, atol=1e-10)


@pytest.mark.slow
def test_panda7_spatial_eq_ddp():
    """BASELINE configs[3]: equality-constrained DDP on a 7-DoF arm with a
    spatial (end-effector) target and AL multipliers."""
    arm = panda7()
    H = 10
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_goal = arm.integrate(q0, 0.06 * jnp.ones(7))
    p_target = arm.frame_position(0, q_goal)
    con = constraints.advance_time(
        constraints.FrameTarget(model=arm, target=p_target, frame_id=0, active_ts=(H,)),
        dyn,
        times=2,
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=jnp.float64),
        constraint=con,
        horizon=H,
        second_order=False,
    )
    params = SolverParams(max_iterations=40, threshold=1e-8, mu=1e8)
    res = jax.jit(lambda x: solve(problem, params, x))(
        base.state_pack(q0, jnp.zeros(7))
    )
    assert float(res.stats.opt_constr) < 1e-5
    p_final = arm.frame_position(0, res.xs[-1, : arm.nq])
    np.testing.assert_allclose(np.asarray(p_final), np.asarray(p_target), atol=1e-4)


@pytest.mark.slow
def test_cartpole_swingup():
    """Cartpole swing-up with a terminal configuration constraint (pole up,
    cart back at origin)."""
    m = cartpole()
    H = 120
    dyn = dynamics.euler(m, 0.02)
    q_up = jnp.asarray([0.0, jnp.pi])
    con = constraints.advance_time(
        constraints.ConfigTarget(model=m, target=q_up, active_ts=(H,)), dyn, times=2
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1e-1, dtype=jnp.float64),
        constraint=con,
        horizon=H,
        second_order=False,
    )
    params = SolverParams(max_iterations=60, threshold=1e-7, mu=1e8)
    res = jax.jit(lambda x: solve(problem, params, x))(jnp.zeros(4))
    assert float(res.stats.opt_constr) < 1e-5
    np.testing.assert_allclose(np.asarray(res.xs[-1, :2]), np.asarray(q_up), atol=1e-4)
