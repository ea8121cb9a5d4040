"""Property tests for the JAX rigid-body engine.

Mirrors the reference's tier-1 Pinocchio property tests (test/pinocchio.cpp:
integrate/difference round-trip and d_difference first-order checks on the
all-joints model, run in MPFR-1000) with float64 + jacfwd as the oracle, and
adds dynamics-level identities (CRBA↔RNEA, FD∘ID, energy conservation) the
reference delegates to Pinocchio's own test suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.models import base
from ddp_tpu.models.pendulum import pendulum
from ddp_tpu.models.rigid_body import (
    all_joints_test_model,
    build_model,
    double_pendulum,
)


@pytest.fixture(scope="module")
def model():
    return all_joints_test_model()


def rand_q(model, key):
    return model.random_configuration(key)


def rand_v(model, key, scale=1.0):
    return scale * jax.random.normal(key, (model.nv,), dtype=jnp.float64)


# ---- manifold ops (≙ test/pinocchio.cpp:17-57) ----


def test_integrate_difference_roundtrip(model):
    for seed in range(5):
        k1, k2 = jax.random.split(jax.random.key(seed))
        q = rand_q(model, k1)
        v = rand_v(model, k2)
        q1 = model.integrate(q, v)
        v_back = model.difference(q, q1)
        np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), atol=1e-9)


def test_difference_integrate_roundtrip(model):
    for seed in range(5):
        k1, k2 = jax.random.split(jax.random.key(seed + 10))
        q0 = rand_q(model, k1)
        q1 = rand_q(model, k2)
        d = model.difference(q0, q1)
        q1_rec = model.integrate(q0, d)
        # compare via difference (configs with quaternions may differ by sign)
        resid = model.difference(q1_rec, q1)
        np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-9)


def test_difference_jacobian_first_order(model):
    """≙ test/pinocchio.cpp:59-100 (d_difference_dq_finish vs perturbation)."""
    k1, k2, k3 = jax.random.split(jax.random.key(42), 3)
    q0 = rand_q(model, k1)
    q1 = rand_q(model, k2)
    x0 = base.state_pack(q0, jnp.zeros(model.nv))
    x1 = base.state_pack(q1, jnp.zeros(model.nv))
    J = base.state_difference_jacobian(model, x0, x1)
    eps = 1e-6
    dx = eps * jax.random.normal(k3, (2 * model.nv,), dtype=jnp.float64)
    d0 = base.state_difference(model, x0, x1)
    d1 = base.state_difference(model, x0, base.state_integrate(model, x1, dx))
    np.testing.assert_allclose(np.asarray(d1 - d0), np.asarray(J @ dx), atol=50 * eps**2)


def test_neutral_configuration_is_identity(model):
    q = model.neutral_configuration()
    v = model.difference(q, q)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-12)


# ---- dynamics identities ----


def test_crba_matches_rnea_columns(model):
    """M e_i = RNEA(q, 0, e_i) − RNEA(q, 0, 0): the standard CRBA/RNEA
    consistency identity."""
    q = rand_q(model, jax.random.key(1))
    M = model.mass_matrix(q)
    zero_v = jnp.zeros(model.nv)
    tau0 = model.rnea(q, zero_v, zero_v)
    for i in range(model.nv):
        e = jnp.zeros(model.nv).at[i].set(1.0)
        col = model.rnea(q, zero_v, e) - tau0
        np.testing.assert_allclose(np.asarray(col), np.asarray(M[:, i]), atol=1e-9)


def test_mass_matrix_spd(model):
    q = rand_q(model, jax.random.key(2))
    M = np.asarray(model.mass_matrix(q))
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_fd_id_roundtrip(model):
    """forward_dynamics then rnea reproduces the input torques."""
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    q = rand_q(model, k1)
    v = rand_v(model, k2)
    tau = rand_v(model, k3, scale=2.0)
    a = model.forward_dynamics(q, v, tau)
    tau_rec = model.rnea(q, v, a)
    np.testing.assert_allclose(np.asarray(tau_rec), np.asarray(tau), atol=1e-8)


@pytest.mark.slow
def test_implicit_fd_jacobians_match_direct(model):
    """The implicit-JVP forward_dynamics (analytical ABA-derivative scheme,
    ≙ pinocchio computeABADerivatives) must produce the same first- AND
    second-order derivatives as plain autodiff through the direct path."""
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    q = rand_q(model, k1)
    v = rand_v(model, k2)
    tau = rand_v(model, k3, scale=2.0)

    J_imp = jax.jacfwd(model.forward_dynamics, argnums=(0, 1, 2))(q, v, tau)
    J_dir = jax.jacfwd(model.forward_dynamics_direct, argnums=(0, 1, 2))(q, v, tau)
    for a, b in zip(J_imp, J_dir):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)

    # second order: the JVP rule has no stop_gradient, so jacfwd∘jacfwd
    # (the full-DDP Hessian path) must differentiate it exactly
    def contract(f):
        def g(qv):
            return f(qv[: model.nq], qv[model.nq :], tau) @ jnp.ones(model.nv)

        return g

    qv = jnp.concatenate([q, v])
    H_imp = jax.jacfwd(jax.jacfwd(contract(model.forward_dynamics)))(qv)
    H_dir = jax.jacfwd(jax.jacfwd(contract(model.forward_dynamics_direct)))(qv)
    np.testing.assert_allclose(np.asarray(H_imp), np.asarray(H_dir), atol=1e-7)


def test_energy_conservation_double_pendulum():
    """Unforced double pendulum conserves energy under fine RK4 rollout."""
    model = double_pendulum()
    from ddp_tpu.ocp.dynamics import rk4

    dyn = rk4(model, 0.001)
    x = base.state_pack(jnp.asarray([0.8, -0.4]), jnp.asarray([0.0, 0.0]))
    e0 = model.energy(x[:2], x[2:])

    def step(x, _):
        return dyn(0, x, jnp.zeros(2)), None

    x_end, _ = jax.lax.scan(step, x, None, length=2000)
    e1 = model.energy(x_end[:2], x_end[2:])
    assert abs(float(e1 - e0)) < 1e-6 * max(1.0, abs(float(e0)))


def test_energy_conservation_all_joints(model):
    """Free-floating all-joints chain conserves energy (gravity included)."""
    from ddp_tpu.ocp.dynamics import rk4

    dyn = rk4(model, 0.0005)
    k1, k2 = jax.random.split(jax.random.key(7))
    q = rand_q(model, k1)
    v = rand_v(model, k2, scale=0.3)
    x = base.state_pack(q, v)
    e0 = model.energy(q, v)

    def step(x, _):
        return dyn(0, x, jnp.zeros(model.nv)), None

    x_end, _ = jax.lax.scan(step, x, None, length=1000)
    e1 = model.energy(x_end[: model.nq], x_end[model.nq :])
    assert abs(float(e1 - e0)) < 1e-4 * max(1.0, abs(float(e0)))


def test_single_revolute_matches_closed_form_pendulum():
    """1-DoF revolute chain == the closed-form pendulum (m=l=1):
    a = −(g/l)·sin q + τ/m  (pendulum_model.hpp:105-114)."""
    rb = build_model(
        [
            dict(
                type="revolute",
                parent=-1,
                axis=[0.0, 1.0, 0.0],
                mass=1.0,
                com=[0.0, 0.0, -1.0],
                inertia=np.zeros((3, 3)),
            )
        ],
        name="rb_pendulum",
    )
    cf = pendulum(1.0, 1.0, dtype=jnp.float64)
    for qv, vv, tv in [(0.3, 0.5, 1.0), (-1.2, 0.1, -2.0), (2.9, -0.7, 0.4)]:
        q = jnp.asarray([qv])
        v = jnp.asarray([vv])
        tau = jnp.asarray([tv])
        a_rb = rb.forward_dynamics(q, v, tau)
        a_cf = cf.forward_dynamics(q, v, tau)
        np.testing.assert_allclose(np.asarray(a_rb), np.asarray(a_cf), atol=1e-10)


# ---- frames ----


def test_frame_position_double_pendulum():
    model = double_pendulum()
    # hanging straight down: tip at z = −2
    q = jnp.zeros(2)
    p = model.frame_position(0, q)
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, -2.0], atol=1e-12)
    # first link horizontal (+x), second straight: rotation about +y by π/2
    # maps −z to... verify against trig directly
    q = jnp.asarray([jnp.pi / 2, 0.0])
    p = model.frame_position(0, q)
    np.testing.assert_allclose(np.asarray(p), [-2.0, 0.0, 0.0], atol=1e-9)


def test_frame_jacobian_vs_fd(model):
    q = rand_q(model, jax.random.key(11))
    J = model.frame_jacobian(0, q)
    assert J.shape == (3, model.nv)
    eps = 1e-7
    for i in range(model.nv):
        e = jnp.zeros(model.nv).at[i].set(eps)
        dp = (model.frame_position(0, model.integrate(q, e)) - model.frame_position(0, q)) / eps
        np.testing.assert_allclose(np.asarray(dp), np.asarray(J[:, i]), atol=1e-5)


def test_vmap_and_jit_compatibility(model):
    """All dynamics entry points vmap and jit (the TPU batching axis)."""
    keys = jax.random.split(jax.random.key(0), 4)
    qs = jnp.stack([rand_q(model, k) for k in keys])
    vs = jnp.stack([rand_v(model, k) for k in keys])
    taus = jnp.stack([rand_v(model, k, 2.0) for k in keys])
    a = jax.jit(jax.vmap(model.forward_dynamics))(qs, vs, taus)
    assert a.shape == (4, model.nv)
    assert np.all(np.isfinite(np.asarray(a)))


def test_world_frame_matches_chain_implementations(model):
    """The vectorized world-frame dynamics must agree with the chain-
    recursive textbook implementations on the all-joints model."""
    k1, k2, k3 = jax.random.split(jax.random.key(21), 3)
    q = rand_q(model, k1)
    v = rand_v(model, k2)
    a = rand_v(model, k3, scale=2.0)
    np.testing.assert_allclose(
        np.asarray(model.rnea(q, v, a)), np.asarray(model.rnea_chain(q, v, a)), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(model.mass_matrix(q)),
        np.asarray(model.mass_matrix_chain(q)),
        atol=1e-9,
    )


def test_state_transport(model):
    """Parallel transport: identity at the same point; norm-preserving-ish
    for pure-rotation manififolds; exact round trip within first order."""
    k1, k2, k3 = jax.random.split(jax.random.key(33), 3)
    q = rand_q(model, k1)
    x = base.state_pack(q, jnp.zeros(model.nv))
    v = rand_v(model, k2, scale=0.5)
    dv = jnp.concatenate([v, rand_v(model, k3, scale=0.5)])
    same = base.state_transport(model, dv, x, x)
    np.testing.assert_allclose(np.asarray(same), np.asarray(dv), atol=1e-9)
    # transporting to a nearby point and back is identity to first order
    x2 = base.state_integrate(model, x, 1e-3 * jnp.ones(2 * model.nv))
    there = base.state_transport(model, dv, x, x2)
    back = base.state_transport(model, there, x2, x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dv), atol=1e-4)


@pytest.mark.slow
def test_bfloat16_dynamics_smoke():
    """Precision envelope (SURVEY §2 #30): the dtype axis reaches bf16.

    Accuracy is checked on the well-conditioned double pendulum (the
    all-joints chain has ~1e-3 tip inertias whose mass-matrix conditioning
    exceeds bf16's 8-bit mantissa — finiteness only there)."""
    dp16 = double_pendulum(dtype=jnp.bfloat16)
    dp64 = double_pendulum(dtype=jnp.float64)
    q = jnp.asarray([0.4, -0.3], jnp.float64)
    v = jnp.asarray([0.2, 0.1], jnp.float64)
    tau = jnp.asarray([1.0, -0.5], jnp.float64)
    a64 = np.asarray(dp64.forward_dynamics(q, v, tau))
    a16 = np.asarray(
        dp16.forward_dynamics(
            q.astype(jnp.bfloat16), v.astype(jnp.bfloat16), tau.astype(jnp.bfloat16)
        )
    ).astype(np.float64)
    scale = np.maximum(np.abs(a64), 1.0)
    assert np.max(np.abs(a16 - a64) / scale) < 0.05

    m16 = all_joints_test_model(dtype=jnp.bfloat16)
    q16 = m16.neutral_configuration()
    a = m16.forward_dynamics(q16, 0.1 * jnp.ones(m16.nv, jnp.bfloat16), jnp.zeros(m16.nv, jnp.bfloat16))
    assert np.isfinite(np.asarray(a).astype(np.float64)).all()
