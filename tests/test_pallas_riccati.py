"""Pallas batched Riccati kernel vs the XLA sweep (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.kernels.riccati_small import backward_sweep_pallas, pack_batch_last
from ddp_tpu.models.pendulum import pendulum
from ddp_tpu.ocp import constraints, costs, dynamics
from ddp_tpu.ocp.problem import Problem
from ddp_tpu.solver import al as al_mod
from ddp_tpu.solver.batched import _backward_sweep


def make_batch(B=8, H=16, dtype=jnp.float32):
    model = pendulum(1.0, 1.0, dtype=dtype)
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model, target=jnp.asarray([2.0], dtype=dtype), active_ts=(H,)
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
    x0s = 0.4 * jax.random.normal(jax.random.key(0), (B, 2), dtype)
    us = 0.3 * jax.random.normal(jax.random.key(1), (B, H, 1), dtype)
    xs = jax.vmap(problem.rollout)(x0s, us)
    derivs = jax.vmap(problem.derivatives)(xs, us)
    mults = jax.vmap(lambda x: al_mod.init_multipliers(problem, x))(xs)
    # give the multipliers non-trivial values so AL terms are exercised
    mults = mults._replace(
        val=0.3 * jax.random.normal(jax.random.key(2), mults.val.shape, dtype),
        jac=0.1 * jax.random.normal(jax.random.key(3), mults.jac.shape, dtype),
    )
    return problem, derivs, mults


def test_pallas_backward_matches_xla():
    B, H = 8, 16
    problem, derivs, mults = make_batch(B, H)
    mu = jnp.full((B,), 1e3, jnp.float32)
    reg = jnp.zeros((B,), jnp.float32)

    k_ref, K_ref, ok_ref = jax.vmap(
        lambda d, mv, mj, m, r: _backward_sweep(d, mv, mj, m, r)
    )(derivs, mults.val, mults.jac, mu, reg)

    packed = pack_batch_last(derivs, mults.val, mults.jac)
    k_p, K_p, ok_p = backward_sweep_pallas(
        packed, mu, reg, T=H, n=2, m=1, e=1, block_b=8, interpret=True
    )
    # kernel layout [T, m, B] / [T, m*n, B] → compare against [B, T, m(,n)]
    k_p_bt = jnp.transpose(k_p, (2, 0, 1))
    K_p_bt = jnp.transpose(K_p.reshape(H, 1, 2, B), (3, 0, 1, 2))
    np.testing.assert_allclose(np.asarray(k_p_bt), np.asarray(k_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(K_p_bt), np.asarray(K_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_ref))


def test_pallas_ok_is_per_sample():
    """A failing sample must not poison the other lanes in its block."""
    B, H = 8, 16
    problem, derivs, mults = make_batch(B, H)
    mu = jnp.full((B,), 1e3, jnp.float32)
    reg = jnp.zeros((B,), jnp.float32)
    # make sample 3's Quu indefinite at every step so its Cholesky fails
    luu_bad = derivs.luu.at[3].set(-10.0 * jnp.eye(1, dtype=jnp.float32))
    derivs = derivs._replace(luu=luu_bad)

    _, _, ok_ref = jax.vmap(
        lambda d, mv, mj, m, r: _backward_sweep(d, mv, mj, m, r)
    )(derivs, mults.val, mults.jac, mu, reg)

    packed = pack_batch_last(derivs, mults.val, mults.jac)
    k_p, K_p, ok_p = backward_sweep_pallas(
        packed, mu, reg, T=H, n=2, m=1, e=1, block_b=8, interpret=True
    )
    assert not bool(ok_p[3])
    assert bool(jnp.all(jnp.delete(ok_p, 3)))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_ref))
    # healthy lanes' gains stay finite
    assert bool(jnp.all(jnp.isfinite(jnp.transpose(k_p, (2, 0, 1))[jnp.arange(B) != 3])))
