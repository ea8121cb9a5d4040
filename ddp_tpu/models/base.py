"""Model protocol and state-space helpers.

A *model* is a pytree (registered dataclass) describing a mechanical system on
a configuration manifold Q with tangent space of dimension ``nv``:

- static dims: ``nq`` (configuration coords), ``nv`` (tangent/velocity dim),
  ``nu`` (control dim; == nv for fully-actuated reference-class systems)
- ``neutral_configuration() -> q``                     (reference: pendulum_model.hpp:41,
  pinocchio_model.ipp neutral)
- ``integrate(q, dq) -> q'``        manifold retraction q ⊕ dq
- ``difference(q0, q1) -> dq``      manifold log    q1 ⊖ q0
- ``forward_dynamics(q, v, tau) -> a``   (reference: ``dynamics_aba``)

Jacobians of all of these are obtained with ``jax.jacfwd`` — the reference's
``d_integrate_dq/dv``, ``d_difference_dq_*`` and ``d_dynamics_aba`` analytic
derivatives (pendulum_model.hpp:57-130) have no hand-written equivalent here.

The *state* is x = concat(q, v) with dim ``nq + nv``; the *tangent state*
dx has dim ``2 nv``.  ``state_integrate`` / ``state_difference`` mirror the
reference's ``dynamics_t::integrate_x`` / ``difference_out``
(problem.hpp:398-418).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def state_pack(q: jax.Array, v: jax.Array) -> jax.Array:
    return jnp.concatenate([q, v], axis=-1)


def state_split(model, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    return x[..., : model.nq], x[..., model.nq :]


def state_neutral(model) -> jax.Array:
    q = model.neutral_configuration()
    return state_pack(q, jnp.zeros((model.nv,), dtype=q.dtype))


def state_integrate(model, x: jax.Array, dx: jax.Array) -> jax.Array:
    """x ⊕ dx with dx = (dq ∈ T_q Q, dv ∈ R^nv).  [problem.hpp:398-407]"""
    q, v = state_split(model, x)
    dq, dv = dx[..., : model.nv], dx[..., model.nv :]
    return state_pack(model.integrate(q, dq), v + dv)


def state_difference(model, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """x1 ⊖ x0 in the tangent space at x0.  [problem.hpp:409-418]"""
    q0, v0 = state_split(model, x0)
    q1, v1 = state_split(model, x1)
    return jnp.concatenate([model.difference(q0, q1), v1 - v0], axis=-1)


def state_transport(model, v: jax.Array, x_from: jax.Array, x_to: jax.Array) -> jax.Array:
    """Parallel-transport a tangent vector from T_{x_from} to T_{x_to}.

    The reference *declares* this surface but never implements it
    (``d_integrate_transport_dq/dv``, pinocchio_model.hpp:113-139 — no
    definition anywhere, SURVEY.md §2 #14).  Here it falls out of autodiff:
    transport is the differential of the chart change
    e ↦ (x_to ⊕ ·) ∘ (x_from ⊕ ·) evaluated at the connecting geodesic,
    approximated to first order by J = d(x1 ⊖ x0 ⊕ e)/de, i.e. the
    difference Jacobian between the two base points.
    """
    J = jax.jacfwd(
        lambda e: state_difference(
            model, x_to, state_integrate(model, x_from, e)
        )
    )(jnp.zeros_like(v))
    return J @ v


def state_difference_jacobian(model, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """d(x1 ⊖ x0)/d x1 expressed in tangent coordinates at x1: the [2nv, 2nv]
    matrix J with (x1 ⊕ e) ⊖ x0 ≈ (x1 ⊖ x0) + J e.

    Reference: ``d_difference_out_dfinish`` (problem.hpp:419-439), which the
    affine-multiplier ``update_origin`` re-expansion depends on
    (mat_seq_common.hpp:80).  Computed with jacfwd instead of analytic
    per-manifold formulas.
    """
    dtype = x1.dtype
    zero = jnp.zeros((2 * model.nv,), dtype=dtype)
    return jax.jacfwd(lambda e: state_difference(model, x0, state_integrate(model, x1, e)))(zero)
