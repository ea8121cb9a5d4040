"""Fused Pallas line-search kernel vs the XLA sweep (interpret mode on CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.kernels.linesearch_flat import linesearch_pallas
from ddp_tpu.models.pendulum import pendulum
from ddp_tpu.ocp import constraints, costs, dynamics
from ddp_tpu.ocp.problem import Problem
from ddp_tpu.solver import al as al_mod
from ddp_tpu.solver.batched import (
    _backward_sweep,
    _linesearch_sweep,
    solve_batched,
)
from ddp_tpu.solver.solve import SolverParams


def make_state(B=8, H=16, dtype=jnp.float32, constrained=True):
    model = pendulum(1.0, 1.0, dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    if constrained:
        con = constraints.advance_time(
            constraints.ConfigTarget(
                model=model, target=jnp.asarray([2.0], dtype=dtype), active_ts=(H,)
            ),
            dyn,
            times=2,
        )
    else:
        con = constraints.NoConstraint()
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=dtype),
        constraint=con,
        horizon=H,
        second_order=False,
    )
    x0s = 0.5 * jax.random.normal(jax.random.key(0), (B, 2), dtype)
    us = 0.2 * jax.random.normal(jax.random.key(1), (B, H, 1), dtype)
    xs = jax.vmap(problem.rollout)(x0s, us)
    derivs = jax.vmap(problem.derivatives)(xs, us)
    mults = jax.vmap(lambda x: al_mod.init_multipliers(problem, x))(xs)
    if constrained:
        mults = mults._replace(
            val=0.3 * jax.random.normal(jax.random.key(2), mults.val.shape, dtype),
            jac=0.1 * jax.random.normal(jax.random.key(3), mults.jac.shape, dtype),
        )
    mu = jnp.full((B,), 1e3, dtype)
    k, K, _ = jax.vmap(lambda d, mv, mj, m, r: _backward_sweep(d, mv, mj, m, r))(
        derivs, mults.val, mults.jac, mu, jnp.zeros((B,), dtype)
    )
    return problem, xs, us, k, K, mults, mu


def _compare(problem, xs, us, k, K, mults, mu, n_cand=7):
    xs_r, us_r, st_r = jax.vmap(
        lambda a, b, c, d, m_, mu_: _linesearch_sweep(problem, a, b, c, d, m_, mu_, n_cand)
    )(xs, us, k, K, mults, mu)
    xs_p, us_p, st_p = linesearch_pallas(
        problem, xs, us, k, K, mults.val, mults.jac, mu,
        n_candidates=n_cand, block_b=xs.shape[0], interpret=True,
    )  # fmt: skip
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_r))
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(xs_r), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_linesearch_pallas_matches_xla_constrained():
    _compare(*make_state(constrained=True))


def test_linesearch_pallas_matches_xla_unconstrained():
    _compare(*make_state(constrained=False))


def test_linesearch_pallas_rejected_keeps_incumbent():
    """Lanes where every candidate raises the AL cost must return the stored
    trajectory bit-exactly with step 0."""
    problem, xs, us, k, K, mults, mu = make_state()
    # anti-descent gains: force cost increase for every candidate
    k_bad = 1e3 * jnp.ones_like(k)
    xs_p, us_p, st_p = linesearch_pallas(
        problem, xs, us, k_bad, jnp.zeros_like(K), mults.val, mults.jac, mu,
        n_candidates=4, block_b=xs.shape[0], interpret=True,
    )  # fmt: skip
    assert float(jnp.max(st_p)) == 0.0
    np.testing.assert_array_equal(np.asarray(us_p), np.asarray(us))
    np.testing.assert_array_equal(np.asarray(xs_p), np.asarray(xs))


@pytest.mark.slow
def test_solve_batched_full_pallas_matches_sweep():
    """backward=pallas + forward=pallas full solve ≈ default backends."""
    problem, *_ = make_state(B=8, H=24)
    params = SolverParams(max_iterations=10, threshold=1e-5, mu=1e4)
    x0s = jnp.stack(
        [jnp.array([q, 0.0], jnp.float32) for q in (-0.5, -0.2, 0.1, 0.4)]
    )
    ref = jax.jit(lambda x: solve_batched(problem, params, x))(x0s)
    pal = jax.jit(
        lambda x: solve_batched(
            problem, params, x, backward="pallas", forward="pallas", interpret=True
        )
    )(x0s)
    assert np.all(np.isfinite(np.asarray(pal.us)))
    np.testing.assert_allclose(
        np.asarray(pal.us), np.asarray(ref.us), rtol=2e-3, atol=2e-3
    )
