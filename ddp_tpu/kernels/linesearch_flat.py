"""Pallas TPU kernel: fused batched line-search forward pass.

After the backward pass moved into a kernel (riccati_small.py), the
line-search rollout became the dominant device cost of the batched solver:
XLA runs it as a T-step scan whose every step is a handful of tiny fused
kernels (profiled at ~60% of device time at B=4096, T=32).  This kernel runs
the ENTIRE line search in one launch with a candidate-major register layout:

- every per-sample scalar is an (8, B) tile — 8 step candidates on the TPU
  sublane axis, the batch block on the lane axis — so all candidates roll
  out in lockstep at full vector-register utilization
- candidate c applies u = u_old + step_c·k + K·(x ⊖ x_old) (ddp_fwd.ipp:39-51)
  and accumulates the augmented-Lagrangian cost l + p(x)·eq + (μ/2)‖eq‖²
  (cost_seq_aug, ddp.hpp:699-735); the LAST candidate has step 0, which
  reproduces the stored trajectory exactly — its cost is the incumbent cost
- acceptance per lane: largest step with Δcost ≤ 0 vs the step-0 row
  (ddp_fwd.ipp:53-63); a second rollout at the per-lane chosen step writes
  (xs_new, us_new); lanes with no accepted candidate copy the incumbent

The problem's cost/constraint/dynamics callables run INSIDE the kernel: the
problem pytree's array leaves are packed into one [P, B] input (Pallas
forbids captured traced constants) and the problem is rebuilt per lane, so
any per-sample-traceable definition works.  Practical support is the
"flat-lane" model class (closed-form dynamics whose ops are elementwise in
the state — pendulum/cartpole/acrobot-style); articulated-arm problems keep
the XLA scan path (their per-step FLOPs are large enough to fill the VPU).

Exactness vs the XLA path is pinned by tests/test_pallas_linesearch.py.

MEASURED VERDICT (TPU v5e, B=4096, T=32, pendulum): this kernel is exact but
SLOWER than the XLA scan forward pass (≈24 ms vs ≈0.4 ms per sweep).  Mosaic
pays ~30 cycles of issue overhead per (8, block_b) vector op and the rollout
is ~100 tiny ops per step, while XLA fuses the same math over the full
candidates×batch lane set (32k lanes) per scan step — per-op overhead
amortizes 256× better.  The Riccati backward kernel (riccati_small.py) wins
for the opposite reason: XLA lowers its per-step Cholesky/solve chain to
unfused lax.linalg ops.  Lesson recorded in docs/DESIGN.md: fuse serial
chains whose XLA lowering is fragmented; leave wide elementwise streams to
XLA.  The kernel stays as an optional backend
(solve_batched(forward="pallas")) and a template for narrow-batch regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 8  # sublane count = number of step candidates per pass


def _ls_kernel(
    xs_ref,  # [T+1, nx, B]
    us_ref,  # [T, m, B]
    k_ref,  # [T, m, B]
    K_ref,  # [T, m*ndx, B]
    pe_ref,  # [T, e_k, B]
    pex_ref,  # [T, e_k*ndx, B]
    mask_ref,  # [T, e_k, B]
    mu_ref,  # [1, B]
    pvec_ref,  # [P, B] packed problem leaves, broadcast over lanes
    xs_out,  # [T+1, nx, B]
    us_out,  # [T, m, B]
    step_out,  # [1, B]
    *,
    T,
    nx,
    ndx,
    m,
    e,
    n_steps,  # candidates 2^0 … 2^-(n_steps-1); rows ≥ n_steps carry step 0
    rebuild,  # pcol [P] -> problem  (per-sample pytree reconstruction)
):
    B = mu_ref.shape[-1]
    dtype = mu_ref.dtype

    def tile(row):  # (B,) -> (C, B)
        return jnp.broadcast_to(row[None, :], (_C, B))

    mu = tile(mu_ref[0])
    zeros = jnp.zeros((_C, B), dtype)

    # step ladder on the sublane axis: [1, ½, …, 2^-(n_steps-1), 0, …, 0]
    # (built from iota — literal arrays would be captured constants)
    crow = jax.lax.broadcasted_iota(jnp.int32, (_C, B), 0)
    steps = jnp.where(
        crow < n_steps, jnp.exp2(-crow.astype(dtype)), jnp.zeros((), dtype)
    )

    # lane adapters: per-sample problem methods vmapped over (candidate, lane)
    pv = jnp.broadcast_to(pvec_ref[...][:, None, :], (pvec_ref.shape[0], _C, B))

    def vv(f, n_in):
        inner = jax.vmap(f, in_axes=(1,) * n_in, out_axes=1)
        return jax.vmap(inner, in_axes=(1,) * n_in, out_axes=1)

    def vdyn(t, x, u):
        return vv(lambda pc, xc, uc: rebuild(pc).dynamics(t, xc, uc), 3)(pv, x, u)

    def vdiff(a, b):
        from ddp_tpu.models.base import state_difference

        return vv(
            lambda pc, ac, bc: state_difference(rebuild(pc).model, ac, bc), 3
        )(pv, a, b)

    def vstage(t, x, u):
        # scalar-out per sample → [C, B]
        inner = jax.vmap(
            lambda pc, xc, uc: rebuild(pc).cost.stage(t, xc, uc),
            in_axes=(1, 1, 1), out_axes=0,
        )  # fmt: skip
        return jax.vmap(inner, in_axes=(1, 1, 1), out_axes=0)(pv, x, u)

    def vterm(x):
        inner = jax.vmap(
            lambda pc, xc: rebuild(pc).cost.terminal(xc), in_axes=(1, 1), out_axes=0
        )
        return jax.vmap(inner, in_axes=(1, 1), out_axes=0)(pv, x)

    def veq(t, x, u):
        return vv(lambda pc, xc, uc: rebuild(pc).constraint.value(t, xc, uc), 3)(
            pv, x, u
        )

    def load_x(ref, t):  # [·, nx, B] row t → [nx, C, B]
        return jnp.stack([tile(ref[t, i]) for i in range(nx)])

    def al_stage(t, x, u, dx):
        """[C, B] AL stage cost: l + p(x)·ce + (μ/2)‖ce‖², p = pe + pex·dx."""
        cost = vstage(t, x, u)
        if e:
            ce = veq(t, x, u)
            for a in range(e):
                cea = ce[a] * tile(mask_ref[t, a])
                p = tile(pe_ref[t, a])
                for j in range(ndx):
                    p = p + tile(pex_ref[t, a * ndx + j]) * dx[j]
                cost = cost + p * cea + 0.5 * mu * cea * cea
        return cost

    def feedback_u(t, dx, step):
        rows = []
        for i in range(m):
            s = tile(us_ref[t, i]) + step * tile(k_ref[t, i])
            for j in range(ndx):
                s = s + tile(K_ref[t, i * ndx + j]) * dx[j]
            rows.append(s)
        return jnp.stack(rows)

    def rollout_cost(step):
        """One lockstep rollout of all candidate rows; returns [C, B] cost."""

        def body(t, carry):
            x, cost = carry
            dx_v = vdiff(load_x(xs_ref, t), x)
            dx = [dx_v[j] for j in range(ndx)]
            u = feedback_u(t, dx, step)
            cost = cost + al_stage(t, x, u, dx)
            return vdyn(t, x, u), cost

        x, cost = jax.lax.fori_loop(0, T, body, (load_x(xs_ref, 0), zeros))
        return cost + vterm(x)

    costs = rollout_cost(steps)  # [C, B]; row n_steps (step 0) = incumbent
    cost0 = costs[n_steps]  # (B,)

    # largest accepted step per lane (float 0/1 masks — Mosaic mis-lays-out
    # 1-D i1 vectors, see riccati_small.py)
    chosen = jnp.zeros((B,), dtype)
    taken = jnp.zeros((B,), dtype)
    for c in range(n_steps):
        acc = jnp.where(costs[c] - cost0 <= 0.0, 1.0, 0.0).astype(dtype)
        newly = acc * (1.0 - taken)
        chosen = chosen + newly * float(2.0**-c)
        taken = jnp.maximum(taken, acc)

    # final rollout at the per-lane chosen step (all sublanes identical);
    # lanes with no accepted candidate follow the stored trajectory exactly
    chosen_t = tile(chosen)
    taken_t = tile(taken)
    for i in range(nx):
        xs_out[0, i] = xs_ref[0, i]

    def body2(t, x):
        dx_v = vdiff(load_x(xs_ref, t), x)
        dx = [dx_v[j] for j in range(ndx)]
        u = feedback_u(t, dx, chosen_t)
        x_next = vdyn(t, x, u)
        rows = []
        for i in range(m):
            us_out[t, i] = jnp.where(taken > 0, u[i][0], us_ref[t, i])
        for i in range(nx):
            row = jnp.where(taken_t > 0, x_next[i], tile(xs_ref[t + 1, i]))
            xs_out[t + 1, i] = row[0]
            rows.append(row)
        return jnp.stack(rows)

    jax.lax.fori_loop(0, T, body2, load_x(xs_ref, 0))
    step_out[0] = chosen


def _pack_problem(problem, dtype):
    """Flatten the problem pytree's array leaves into one [P] vector plus a
    per-sample reconstruction function (Pallas kernels may not capture traced
    constants — the leaves ride in as an input instead).

    The pack dtype is the promotion of the solve dtype with every float leaf
    dtype, so wider-float leaves survive the round trip; leaves that cannot
    be represented exactly in the pack dtype (e.g. int32 beyond the float's
    integer span) raise instead of silently truncating."""
    leaves, treedef = jax.tree.flatten(problem)
    pack_dt = jnp.dtype(dtype)
    for leaf in leaves:
        dt = jnp.asarray(leaf).dtype
        if jnp.issubdtype(dt, jnp.floating):
            pack_dt = jnp.promote_types(pack_dt, dt)
    meta = []
    flat = []
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.integer):
            # exactness check: concrete ints round-trip-verified eagerly;
            # traced ints can't be checked → reject out of range dtypes
            span = 2 ** (jnp.finfo(pack_dt).nmant + 1)
            if isinstance(arr, jax.core.Tracer):
                if jnp.iinfo(arr.dtype).max >= span:
                    raise TypeError(
                        f"traced integer leaf {arr.dtype} may exceed the "
                        f"exact-integer span of pack dtype {pack_dt}"
                    )
            elif np.any(np.abs(np.asarray(arr, np.int64)) >= span):
                raise TypeError(
                    f"integer leaf with values beyond ±2^{jnp.finfo(pack_dt).nmant + 1}"
                    f" cannot ride exactly in pack dtype {pack_dt}"
                )
        meta.append((arr.shape, int(np.prod(arr.shape)) if arr.ndim else 1, arr.dtype))
        flat.append(jnp.ravel(arr).astype(pack_dt))
    pvec = jnp.concatenate(flat) if flat else jnp.zeros((1,), pack_dt)

    def rebuild(pcol):
        out, o = [], 0
        for shape, sz, dt in meta:
            out.append(pcol[o : o + sz].reshape(shape).astype(dt))
            o += sz
        return jax.tree.unflatten(treedef, out)

    return pvec, rebuild


def linesearch_pallas(
    problem,
    xs,  # [B, T+1, nx]
    us,  # [B, T, m]
    k,  # [B, T, m]
    K,  # [B, T, m, ndx]
    mult_val,  # [B, T, e]   (origin == xs[:, :-1])
    mult_jac,  # [B, T, e, ndx]
    mu,  # [B]
    n_candidates: int = 7,
    block_b: int | None = None,
    interpret: bool = False,
):
    """Batch-major fused line search.  Returns (xs_new, us_new, step_used)
    with the same semantics as solver/batched.py::_linesearch_sweep.

    ``n_candidates`` ≤ 7: the 8 sublanes carry the candidate ladder plus the
    mandatory step-0 (incumbent) row.
    """
    B, Tp1, nx = xs.shape
    T = Tp1 - 1
    m = us.shape[-1]
    ndx = K.shape[-1]
    e = mult_val.shape[-1]
    dtype = xs.dtype
    if n_candidates > _C - 1:
        raise ValueError(f"n_candidates must be ≤ {_C - 1}, got {n_candidates}")
    if block_b is None:
        # Mosaic's scoped-VMEM stack allocator overflows above 128 lanes for
        # this kernel's live set (measured: 43 MB at 1024, 16 MB limit)
        block_b = min(B, 128)
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")

    mask = jnp.asarray(problem.eq_mask(), dtype)  # [T, e]
    pvec, rebuild = _pack_problem(problem, dtype)
    P = pvec.shape[0]
    pvec_bl = jnp.broadcast_to(pvec[:, None], (P, B))

    def tl(a, rows):
        """[B, T, …] → [T, rows, B]."""
        return jnp.transpose(a.reshape(B, a.shape[1], rows), (1, 2, 0))

    e_k = max(e, 1)  # zero-width blocks are unsupported; pad with zeros
    if e:
        pe_bl = tl(mult_val, e)
        pex_bl = tl(mult_jac, e * ndx)
        mask_bl = jnp.broadcast_to(mask[:, :, None], (T, e, B))
    else:
        pe_bl = jnp.zeros((T, 1, B), dtype)
        pex_bl = jnp.zeros((T, ndx, B), dtype)
        mask_bl = jnp.zeros((T, 1, B), dtype)

    def bs(rows, nt=None):
        if nt is None:
            return pl.BlockSpec(
                (rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec(
            (nt, rows, block_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _ls_kernel,
        T=T, nx=nx, ndx=ndx, m=m, e=e, n_steps=n_candidates, rebuild=rebuild,
    )  # fmt: skip
    xs_o, us_o, step_o = pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            bs(nx, T + 1), bs(m, T), bs(m, T), bs(m * ndx, T),
            bs(e_k, T), bs(e_k * ndx, T), bs(e_k, T),
            bs(1), bs(P),
        ],  # fmt: skip
        out_specs=(bs(nx, T + 1), bs(m, T), bs(1)),
        out_shape=(
            jax.ShapeDtypeStruct((T + 1, nx, B), dtype),
            jax.ShapeDtypeStruct((T, m, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
        ),
        interpret=interpret,
    )(
        tl(xs, nx), tl(us, m), tl(k, m), tl(K, m * ndx),
        pe_bl, pex_bl, mask_bl, mu[None, :], pvec_bl,
    )  # fmt: skip
    xs_new = jnp.transpose(xs_o, (2, 0, 1))
    us_new = jnp.transpose(us_o, (2, 0, 1))
    return xs_new, us_new, step_o[0]
