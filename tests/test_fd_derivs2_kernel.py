"""Exactness tests for the batched SECOND-order fd-derivatives Pallas kernel
(kernels/fd_derivs2.py) against jacfwd∘jacfwd of the model's forward
dynamics.  f64 interpret mode on CPU — the MPFR-oracle role (SURVEY.md §4);
≙ the reference's always-on dynamics Hessians (problem.hpp:989-997) computed
by finite differences of analytic ABA Jacobians (problem.hpp:67-150)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.kernels.fd_derivs2 import fd_derivs2_pallas
from ddp_tpu.models.robots import acrobot, cartpole


def _hessian_oracle(model, z):
    nv = model.nv

    def a_fn(z_):
        return model.forward_dynamics(z_[:nv], z_[nv : 2 * nv], z_[2 * nv :])

    a = jax.vmap(a_fn)(z)
    J = jax.vmap(jax.jacfwd(a_fn))(z)
    H = jax.vmap(jax.jacfwd(jax.jacfwd(a_fn)))(z)
    return a, J, H


@pytest.mark.slow  # interpret-mode run of the unrolled kernel
@pytest.mark.parametrize("make", [cartpole, acrobot])
def test_fd2_kernel_matches_jacfwd_hessian(make):
    model = make(dtype=jnp.float64)
    nv = model.nv
    rng = np.random.default_rng(0)
    N = 128
    q = jnp.asarray(rng.standard_normal((N, nv)))
    v = jnp.asarray(rng.standard_normal((N, nv)))
    tau = jnp.asarray(rng.standard_normal((N, nv)))
    a_k, A_k, Bv_k, Mi_k, H_k = fd_derivs2_pallas(
        model, q, v, tau, block_b=128, interpret=True
    )
    z = jnp.concatenate([q, v, tau], axis=1)
    a_r, J_r, H_r = _hessian_oracle(model, z)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(A_k), np.asarray(J_r[:, :, :nv]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(Bv_k), np.asarray(J_r[:, :, nv : 2 * nv]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(Mi_k), np.asarray(J_r[:, :, 2 * nv :]), atol=1e-9
    )
    # the headline claim: the full (q, v, τ) acceleration Hessian is exact
    np.testing.assert_allclose(np.asarray(H_k), np.asarray(H_r), atol=1e-8)
    # symmetry + the structurally-zero ττ block
    np.testing.assert_allclose(
        np.asarray(H_k), np.asarray(jnp.swapaxes(H_k, -1, -2)), atol=0
    )
    assert float(jnp.max(jnp.abs(H_k[:, :, 2 * nv :, 2 * nv :]))) == 0.0


@pytest.mark.slow
def test_solve_batched_full_ddp_deriv_pallas_matches_jvp():
    """Full-DDP batched solve with deriv='pallas' (second-order kernel)
    equals the generic jacfwd∘jacfwd path (f64, interpret mode)."""
    from ddp_tpu.models import base
    from ddp_tpu.ocp import constraints, costs, dynamics
    from ddp_tpu.ocp.problem import Problem
    from ddp_tpu.solver.batched import solve_batched
    from ddp_tpu.solver.solve import SolverParams

    model = cartpole(dtype=jnp.float64)
    H = 8
    B = 16  # B*H = 128 = one lane block
    dyn = dynamics.euler(model, 0.01)
    con = constraints.advance_time(
        constraints.ConfigTarget(
            model=model,
            target=jnp.asarray([0.1, 0.2], jnp.float64),
            active_ts=(H,),
        ),
        dyn,
        times=2,
    )
    problem = Problem(
        dynamics=dyn,
        cost=costs.quad_control(1.0, dtype=jnp.float64),
        constraint=con,
        horizon=H,
        second_order=True,
    )
    params = SolverParams(max_iterations=3, threshold=1e-9, mu=1e4)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.standard_normal((B, 4)) * 0.3)
    r_jvp = solve_batched(problem, params, x0s, deriv="jvp")
    r_pal = solve_batched(
        problem, params, x0s, deriv="pallas", block_b=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.us), np.asarray(r_jvp.us), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r_pal.opt_constr), np.asarray(r_jvp.opt_constr), atol=1e-9
    )
