"""Problem aggregate: dynamics + cost + equality constraint + derivatives.

Reference analog: ``problem_t`` (problem.hpp:872-1150).  The reference's
derivative engine is a finite-difference Hessian machine over analytic
first-order Pinocchio derivatives (problem.hpp:50-341); here every derivative
is one ``jax.jacfwd`` (or jacfwd∘jacfwd) of the tangent-space local maps

    l̃(dx, du)  = l(t, x ⊕ dx, u + du)
    f̃(dx, du)  = f(t, x ⊕ dx, u + du) ⊖ f(t, x, u)
    eq̃(dx, du) = eq(t, x ⊕ dx, u + du)

evaluated at 0, vmapped over the whole horizon, so XLA fuses the entire
derivative sweep into one compiled program per solve.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.models.base import state_difference, state_integrate


def _vector_space(model) -> bool:
    from ddp_tpu.ocp.dynamics import _vector_space_config

    return _vector_space_config(model)


class Derivs(NamedTuple):
    """Struct-of-stacked-arrays derivative storage.

    Reference analog: derivative_storage_t (ddp.hpp:52-245).  Hessian layout
    follows the reference tensors (outdim, indim_l, indim_r): e.g.
    ``fux[t, o, i, j] = ∂²f_o/∂u_i∂x_j``.
    """

    lx: jax.Array  # [T, ndx]
    lu: jax.Array  # [T, nu]
    lxx: jax.Array  # [T, ndx, ndx]
    lux: jax.Array  # [T, nu, ndx]
    luu: jax.Array  # [T, nu, nu]
    fx: jax.Array  # [T, ndx, ndx]
    fu: jax.Array  # [T, ndx, nu]
    fxx: jax.Array  # [T, ndx, ndx, ndx]
    fux: jax.Array  # [T, ndx, nu, ndx]
    fuu: jax.Array  # [T, ndx, nu, nu]
    eq: jax.Array  # [T, ne]
    eqx: jax.Array  # [T, ne, ndx]
    equ: jax.Array  # [T, ne, nu]
    eqxx: jax.Array  # [T, ne, ndx, ndx]
    equx: jax.Array  # [T, ne, nu, ndx]
    equu: jax.Array  # [T, ne, nu, nu]
    lfx: jax.Array  # [ndx]
    lfxx: jax.Array  # [ndx, ndx]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    dynamics: object
    cost: object
    constraint: object
    horizon: int = dataclasses.field(metadata={"static": True})
    # False → Gauss-Newton/iLQR mode: f and eq Hessians are zero.  The
    # reference always runs full DDP; iLQR mode is the fast TPU default for
    # batched workloads.
    second_order: bool = dataclasses.field(default=True, metadata={"static": True})

    @property
    def model(self):
        return self.dynamics.model

    @property
    def nx(self) -> int:
        return self.model.nq + self.model.nv

    @property
    def ndx(self) -> int:
        return 2 * self.model.nv

    @property
    def nu(self) -> int:
        return self.model.nu

    @property
    def ne(self) -> int:
        return self.constraint.ne

    def f(self, t, x, u):
        return self.dynamics(t, x, u)

    def l(self, t, x, u):
        return self.cost.stage(t, x, u)

    def lf(self, x):
        return self.cost.terminal(x)

    def eq_mask(self) -> np.ndarray:
        """Static [T, ne] 0/1 activity mask (≙ range/periodic row-filter
        indexers, indexer.hpp:328-448)."""
        T, ne = self.horizon, self.ne
        if hasattr(self.constraint, "row_mask"):
            rows = [self.constraint.row_mask(t) for t in range(T)]
            return np.stack(rows).astype(np.float64) if T else np.zeros((0, ne))
        return np.array(
            [[float(self.constraint.active(t))] * ne for t in range(T)], dtype=np.float64
        ).reshape(T, ne)

    def eq(self, t, x, u):
        """Unmasked constraint value; solver-facing users should go through
        eq_masked/derivatives."""
        return self.constraint.value(t, x, u)

    def eq_all(self, xs, us):
        """Masked eq values for a whole trajectory: [T, ne] — evaluated only
        at the statically-active timesteps (zeros elsewhere by definition)."""
        T, ne = self.horizon, self.ne
        mask = jnp.asarray(self.eq_mask(), dtype=xs.dtype)
        active = self.active_ts()
        if ne == 0 or not active:
            return jnp.zeros((T, ne), dtype=xs.dtype)
        if len(active) == T:
            ts = jnp.arange(T)
            return jax.vmap(self.constraint.value)(ts, xs[:-1], us) * mask
        ts_a = np.asarray(active)
        vals = jax.vmap(self.constraint.value)(
            jnp.asarray(ts_a), xs[:-1][ts_a], us[ts_a]
        )
        out = jnp.zeros((T, ne), dtype=xs.dtype).at[ts_a].set(vals)
        return out * mask

    def rollout(self, x0, us):
        """Roll the dynamics forward: xs[0]=x0, xs[t+1]=f(t, xs[t], us[t]).

        ≙ make_trajectory (ddp.hpp:392-415)."""

        def body(x, tu):
            t, u = tu
            x_next = self.dynamics(t, x, u)
            return x_next, x_next

        ts = jnp.arange(self.horizon)
        _, xs_next = jax.lax.scan(body, x0, (ts, us))
        return jnp.concatenate([x0[None], xs_next], axis=0)

    def active_ts(self) -> tuple:
        """Static tuple of timesteps with any active constraint row.

        The schedule is trace-time data (≙ the reference's row-filter
        indexers knowing their nonzero rows at construction,
        indexer.hpp:328-448): terminal-constrained problems activate 1-2 of
        T steps, so constraint derivatives/penalties are only *computed*
        there and scattered into the dense arrays."""
        mask = self.eq_mask()
        return tuple(int(t) for t in np.nonzero(mask.any(axis=1))[0])

    def derivatives(self, xs, us, fx_fu=None, f_hess=None) -> Derivs:
        """All first/second-order derivatives along (xs, us).

        ≙ problem_t::compute_derivatives (problem.hpp:956-1141), minus the
        finite differences.  Two TPU-first structural savings over a naive
        jacfwd sweep (both exact — same chain rule, fewer evaluations):

        - one traced JVP pass per timestep shares the primal chain between
          the values (l, f, eq) and their Jacobians — the raw next state is
          differentiated in coordinates and chained through the manifold
          difference afterwards, so the dynamics primal is evaluated once;
        - constraint derivatives are evaluated only at the statically-active
          timesteps (``active_ts``) and scattered into the dense [T, …]
          arrays — a terminal constraint costs 1-2 evaluations, not T.
        """
        model = self.model
        ndx, nu, ne, T = self.ndx, self.nu, self.ne, self.horizon
        nz = ndx + nu
        dtype = xs.dtype
        mask = jnp.asarray(self.eq_mask(), dtype=dtype)
        z0 = jnp.zeros((nz,), dtype=dtype)
        eye_z = jnp.eye(nz, dtype=dtype)

        # ---- cost + dynamics: every timestep, one shared-primal pass ----
        def per_t(t, x, u):
            def g(z):
                dx, du = z[:ndx], z[ndx:]
                xp = state_integrate(model, x, dx)
                up = u + du
                return self.cost.stage(t, xp, up), self.dynamics(t, xp, up)

            # vmap-of-jvp over the tangent basis: the primal chain has no
            # batch dim, so one dynamics evaluation feeds all nz columns
            (l0, f_raw), (lz, fz_raw) = jax.vmap(
                lambda e: jax.jvp(g, (z0,), (e,)), out_axes=(None, 0)
            )(eye_z)
            # chain the coordinate Jacobian through the manifold difference
            # at the base point: f_loc = (· ⊖ f_raw) ∘ f  ⇒  J = E · J_raw
            E = jax.jacfwd(lambda xn: state_difference(model, f_raw, xn))(f_raw)
            fz = E @ fz_raw.T  # [ndx, nz]
            if self.second_order:
                analytic2 = getattr(
                    self.dynamics, "analytic_jacobians_ok", False
                ) and _vector_space(model)
                if analytic2:
                    # forward-over-assembled-analytic: differentiate the
                    # assembled tangent Jacobian (one RNEA-jacfwd + one
                    # Cholesky per evaluation) instead of pushing nested
                    # JVPs through the implicit-FD rule — same exact
                    # Hessian on vector-space configurations (charts are
                    # translations, so ∂(J at z)/∂z IS the local-map
                    # Hessian), much shallower graph (the full-DDP arm
                    # sweep otherwise exceeds the remote compiler budget)
                    def jac_flat(z):
                        dx, du = z[:ndx], z[ndx:]
                        _, fx_, fu_ = self.dynamics.jacobians(
                            t, state_integrate(model, x, dx), u + du
                        )
                        return jnp.concatenate([fx_, fu_], axis=1)

                    fzz = jax.jacfwd(jac_flat)(z0)
                    lzz = jax.jacfwd(
                        jax.jacfwd(
                            lambda z: self.cost.stage(
                                t,
                                state_integrate(model, x, z[:ndx]),
                                u + z[ndx:],
                            )
                        )
                    )(z0)
                else:

                    def g2(z):
                        dx, du = z[:ndx], z[ndx:]
                        xp = state_integrate(model, x, dx)
                        up = u + du
                        return self.cost.stage(t, xp, up), state_difference(
                            model, f_raw, self.dynamics(t, xp, up)
                        )

                    lzz, fzz = jax.jacfwd(jax.jacfwd(g2))(z0)
            else:
                lzz = jax.jacfwd(
                    jax.jacfwd(
                        lambda z: self.cost.stage(
                            t, state_integrate(model, x, z[:ndx]), u + z[ndx:]
                        )
                    )
                )(z0)
                fzz = jnp.zeros((ndx, nz, nz), dtype=dtype)
            return lz, lzz, fz, fzz

        def per_t_analytic(t, x, u):
            # assembled Euler-step Jacobian (dynamics.jacobians): the model's
            # ∂FD blocks from one kinematics pass + one Cholesky — no JVP
            # columns pushed through the dynamics at all.  Valid for every
            # joint type: dynamics.jacobians itself chains the ⊕/⊖ chart
            # corrections for manifold (quaternion/SO(2)) configurations, so
            # fx/fu are already tangent-space Jacobians here.
            def c(z):
                dx, du = z[:ndx], z[ndx:]
                return self.cost.stage(
                    t, state_integrate(model, x, dx), u + du
                )

            lz_ = jax.jacfwd(c)(z0)
            lzz_ = jax.jacfwd(jax.jacfwd(c))(z0)
            _, fx, fu = self.dynamics.jacobians(t, x, u)
            fz_ = jnp.concatenate([fx, fu], axis=1)
            fzz_ = jnp.zeros((ndx, nz, nz), dtype=dtype)
            return lz_, lzz_, fz_, fzz_

        use_analytic = not self.second_order and getattr(
            self.dynamics, "analytic_jacobians_ok", False
        )
        ts = jnp.arange(T)
        if fx_fu is not None and self.second_order and f_hess is None:
            raise ValueError(
                "precomputed fx_fu without f_hess is first-order (GN) only; "
                "full-DDP callers must supply the dynamics Hessian tensor "
                "(e.g. from kernels/fd_derivs2.py)"
            )
        if f_hess is not None and fx_fu is None:
            raise ValueError("f_hess requires matching fx_fu")
        if fx_fu is not None and not getattr(
            self.dynamics, "analytic_jacobians_ok", False
        ):
            # fx_fu must be TANGENT-space Jacobians (what
            # dynamics.jacobians produces — incl. the chart corrections on
            # manifold models); models without that surface have no valid
            # producer, so reject instead of silently skipping the E
            # correction the generic per_t applies (ADVICE r3)
            raise ValueError(
                "fx_fu requires dynamics.analytic_jacobians_ok "
                "(dynamics.jacobians is the producer of valid tangent-space "
                "fx/fu); other models need the generic JVP path"
            )
        if fx_fu is not None:
            # dynamics Jacobians (and, for full DDP, the Hessian tensor)
            # precomputed by the caller — e.g. the batched Pallas
            # fd-derivatives kernels (kernels/fd_derivs.py first-order,
            # kernels/fd_derivs2.py second-order), which fuse the whole
            # kinematic chain for all B·T samples in VMEM; only cost
            # derivatives remain per timestep
            fxg, fug = fx_fu

            def per_t_given(t, x, u, fx_, fu_, fzz_given=None):
                def c(z):
                    dx, du = z[:ndx], z[ndx:]
                    return self.cost.stage(
                        t, state_integrate(model, x, dx), u + du
                    )

                lz_ = jax.jacfwd(c)(z0)
                lzz_ = jax.jacfwd(jax.jacfwd(c))(z0)
                fz_ = jnp.concatenate([fx_, fu_], axis=1)
                fzz_ = (
                    fzz_given
                    if fzz_given is not None
                    else jnp.zeros((ndx, nz, nz), dtype=dtype)
                )
                return lz_, lzz_, fz_, fzz_

            if f_hess is not None:
                lz, lzz, fz, fzz = jax.vmap(per_t_given)(
                    ts, xs[:-1], us, fxg, fug, f_hess
                )
            else:
                lz, lzz, fz, fzz = jax.vmap(per_t_given)(ts, xs[:-1], us, fxg, fug)
        else:
            lz, lzz, fz, fzz = jax.vmap(
                per_t_analytic if use_analytic else per_t
            )(ts, xs[:-1], us)

        # ---- constraint: statically-active timesteps only ----
        def eq_t(t, x, u):
            def h(z):
                dx, du = z[:ndx], z[ndx:]
                return self.constraint.value(
                    t, state_integrate(model, x, dx), u + du
                )

            eq0, eqz_cols = jax.vmap(
                lambda e: jax.jvp(h, (z0,), (e,)), out_axes=(None, 0)
            )(eye_z)
            eqz = eqz_cols.T  # [ne, nz]
            if self.second_order:
                eqzz = jax.jacfwd(jax.jacfwd(h))(z0)
            else:
                eqzz = jnp.zeros((ne, nz, nz), dtype=dtype)
            return eq0, eqz, eqzz

        active = self.active_ts()
        if ne == 0 or not active:
            eq0 = jnp.zeros((T, ne), dtype=dtype)
            eqz = jnp.zeros((T, ne, nz), dtype=dtype)
            eqzz = jnp.zeros((T, ne, nz, nz), dtype=dtype)
        elif len(active) == T:
            eq0, eqz, eqzz = jax.vmap(eq_t)(ts, xs[:-1], us)
        else:
            ts_a = np.asarray(active)
            eq0_a, eqz_a, eqzz_a = jax.vmap(eq_t)(
                jnp.asarray(ts_a), xs[:-1][ts_a], us[ts_a]
            )
            eq0 = jnp.zeros((T, ne), dtype=dtype).at[ts_a].set(eq0_a)
            eqz = jnp.zeros((T, ne, nz), dtype=dtype).at[ts_a].set(eqz_a)
            eqzz = jnp.zeros((T, ne, nz, nz), dtype=dtype).at[ts_a].set(eqzz_a)

        sx = slice(None, ndx)
        su = slice(ndx, None)

        def lfg(dx):
            return self.cost.terminal(state_integrate(model, xs[-1], dx))

        dx0 = jnp.zeros((ndx,), dtype=dtype)
        lfx = jax.jacfwd(lfg)(dx0)
        lfxx = jax.jacfwd(jax.jacfwd(lfg))(dx0)

        m1 = mask[:, :, None]
        m2 = mask[:, :, None, None]
        return Derivs(
            lx=lz[:, sx],
            lu=lz[:, su],
            lxx=lzz[:, sx, sx],
            lux=lzz[:, su, sx],
            luu=lzz[:, su, su],
            fx=fz[:, :, sx],
            fu=fz[:, :, su],
            fxx=fzz[:, :, sx, sx],
            fux=fzz[:, :, su, sx],
            fuu=fzz[:, :, su, su],
            eq=eq0 * mask,
            eqx=eqz[:, :, sx] * m1,
            equ=eqz[:, :, su] * m1,
            eqxx=eqzz[:, :, sx, sx] * m2,
            equx=eqzz[:, :, su, sx] * m2,
            equu=eqzz[:, :, su, su] * m2,
            lfx=lfx,
            lfxx=lfxx,
        )
