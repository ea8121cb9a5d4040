"""Parity tests for the batched fd-derivatives Pallas kernel
(kernels/fd_derivs.py) against the XLA implicit-rule path
(models/rigid_body.py::fd_derivatives).  f64 interpret mode on CPU — the
MPFR-oracle role (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.kernels.fd_derivs import fd_derivs_pallas, model_spec
from ddp_tpu.models.robots import panda7, ur5, cartpole, quadrotor


def _rand_inputs(model, n, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((n, model.nq)))
    v = jnp.asarray(rng.standard_normal((n, model.nv)))
    tau = jnp.asarray(rng.standard_normal((n, model.nv)))
    return q, v, tau


@pytest.mark.slow  # interpret-mode compile of the unrolled kernel is minutes cold
@pytest.mark.parametrize("make", [ur5, panda7, cartpole])
def test_fd_kernel_matches_xla_implicit_rule(make):
    model = make(dtype=jnp.float64)
    N = 128
    q, v, tau = _rand_inputs(model, N)
    a_k, A_k, Bv_k, Mi_k = fd_derivs_pallas(
        model, q, v, tau, block_b=128, interpret=True
    )

    def ref(q_, v_, t_):
        a, A, Bv, Bu = model.fd_derivatives(q_, v_, t_)
        return a, A, Bv, Bu

    a_r, A_r, Bv_r, Bu_r = jax.vmap(ref)(q, v, tau)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Bv_k), np.asarray(Bv_r), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Mi_k), np.asarray(Bu_r), atol=1e-9)


def test_fd_kernel_rejects_quaternion_models():
    with pytest.raises(ValueError):
        model_spec(quadrotor(dtype=jnp.float64))


@pytest.mark.slow
def test_solve_batched_deriv_pallas_matches_jvp():
    """Full batched solve with deriv='pallas' equals the JVP path (f64,
    interpret mode, elementwise)."""
    from ddp_tpu.models import base
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    arm = ur5(dtype=jnp.float64)
    H = 4
    dyn = dynamics.euler(arm, 0.01)
    q0 = arm.neutral_configuration()
    q_t = arm.integrate(q0, jnp.asarray(0.05 * np.arange(1.0, 7.0)))
    con = constraints.advance_time(
        constraints.ConfigTarget(model=arm, target=q_t, active_ts=(H,)),
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
    params = SolverParams(
        max_iterations=3, threshold=1e-6, mu=1e4, inner_iters_max=1
    )
    x0 = base.state_pack(q0, jnp.zeros(arm.nv))
    rng = np.random.default_rng(3)
    B = 32  # B*T = 128 = one lane block
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.1 * rng.standard_normal((B, problem.nx))
    )

    r_jvp = solve_batched(problem, params, x0s)
    r_pal = solve_batched(
        problem, params, x0s, deriv="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.us), np.asarray(r_jvp.us), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.opt_constr), np.asarray(r_jvp.opt_constr), atol=1e-9
    )


def test_spec_cache_bounded_lru():
    """The fd-kernel model-spec cache is a bounded LRU (ADVICE r3): distinct
    model-constant patterns evict the oldest entry past the cap instead of
    growing without bound."""
    from ddp_tpu.kernels import fd_derivs as fd

    fd._SPEC_CACHE.clear()
    cap = fd._SPEC_CACHE_MAX
    fake = {"joint_types": ("revolute",)}  # enough for _make_fd_call's nv
    for i in range(cap + 3):
        fd._spec_cache_get(("key", i), fake)
    assert len(fd._SPEC_CACHE) == cap
    assert ("key", 0) not in fd._SPEC_CACHE  # oldest evicted
    assert ("key", cap + 2) in fd._SPEC_CACHE
    # each entry holds its own jitted callable (eviction drops exactly that
    # spec's compilations — ADVICE r4)
    assert callable(fd._SPEC_CACHE[("key", cap + 2)])
    # hit refreshes LRU order: touching the oldest survivor keeps it alive
    oldest = next(iter(fd._SPEC_CACHE))
    fd._spec_cache_get(oldest, fake)
    fd._spec_cache_get(("key", 999), fake)
    assert oldest in fd._SPEC_CACHE
    fd._SPEC_CACHE.clear()
