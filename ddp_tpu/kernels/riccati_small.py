"""Pallas TPU kernel: batched small-dimension Riccati backward sweep.

The hot op of the batched pendulum-class workload (BASELINE north star:
"the per-timestep Riccati backward recursion … written as Pallas kernels
over batched matrix sequences").  XLA's vmapped scan dispatches ~T separate
fused kernels per sweep with [B, n, m] layouts whose tiny trailing dims
waste lanes; this kernel instead:

- lays the batch on the TPU lane axis: every stacked array is [T, n*m, B]
  (B = multiple of 128), so each tiny-matrix element is one [B]-vector VPU op
- runs the whole reverse time loop INSIDE one kernel (fori_loop), carrying
  (Vx, Vxx) in VMEM scratch — one kernel launch per sweep instead of T
- unrolls the n/m/e index algebra in Python at trace time (static small
  dims), including an unrolled Cholesky–Banachiewicz factorization and
  triangular solves for Quu

Gauss-Newton form (no dynamics Hessians) with AL multiplier terms — the
throughput path's math (solver/batched.py::_backward_sweep with
fxx=fux=fuu=0).  Exactness vs the XLA path is pinned by tests.

Grid: one program per B-block (block size 128×k).  All [T, ·, B] inputs are
sliced to the program's B-block via BlockSpecs; the T loop is internal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_unrolled(A, rhs_list, m, reg):
    """Factor A (+reg·I) ∈ sym[m,m] given as nested [B]-vector lists and
    solve for each rhs in rhs_list (each a length-m list of [B]-vectors).

    Unrolled Cholesky–Banachiewicz + forward/back substitution; every
    statement is one VPU op over the batch lane vector."""
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            s = A[i][j] + (reg if i == j else 0.0)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    outs = []
    for rhs in rhs_list:
        # forward: L y = rhs
        y = [None] * m
        for i in range(m):
            s = rhs[i]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        # backward: Lᵀ x = y
        x = [None] * m
        for i in reversed(range(m)):
            s = y[i]
            for k in range(i + 1, m):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        outs.append(x)
    return outs, L


def _bwd_kernel(
    # refs: [T, n*m, Bblk] stacked derivative blocks (see caller ordering);
    # with second_order=True six tensor blocks (fxx … equu) follow lfxx
    *args,
    T, n, m, e, second_order,
):  # fmt: skip
    (lx_ref, lu_ref, lxx_ref, lux_ref, luu_ref,
     fx_ref, fu_ref,
     eq_ref, eqx_ref, equ_ref, pe_ref, pex_ref,
     mu_ref, reg_ref, lfx_ref, lfxx_ref) = args[:16]  # fmt: skip
    rest = args[16:]
    if second_order:
        fxx_ref, fux_ref, fuu_ref, eqxx_ref, equx_ref, equu_ref = rest[:6]
        rest = rest[6:]
    k_out, K_out, ok_out, Vx_out, Vxx_out, Vx_s, Vxx_s = rest
    mu = mu_ref[0, :]
    reg = reg_ref[0, :]

    # terminal V into scratch
    for i in range(n):
        Vx_s[i, :] = lfx_ref[i, :]
        for j in range(n):
            Vxx_s[i * n + j, :] = lfxx_ref[i * n + j, :]

    def at(ref, t, idx):
        return ref[t, idx, :]

    def body(step, ok):
        t = T - 1 - step
        # load blocks as nested lists of [B] vectors
        lx = [at(lx_ref, t, i) for i in range(n)]
        lu = [at(lu_ref, t, i) for i in range(m)]
        lxx = [[at(lxx_ref, t, i * n + j) for j in range(n)] for i in range(n)]
        lux = [[at(lux_ref, t, i * n + j) for j in range(n)] for i in range(m)]
        luu = [[at(luu_ref, t, i * m + j) for j in range(m)] for i in range(m)]
        fx = [[at(fx_ref, t, i * n + j) for j in range(n)] for i in range(n)]
        fu = [[at(fu_ref, t, i * m + j) for j in range(m)] for i in range(n)]
        eq = [at(eq_ref, t, i) for i in range(e)]
        eqx = [[at(eqx_ref, t, i * n + j) for j in range(n)] for i in range(e)]
        equ = [[at(equ_ref, t, i * m + j) for j in range(m)] for i in range(e)]
        pe = [at(pe_ref, t, i) for i in range(e)]
        pex = [[at(pex_ref, t, i * n + j) for j in range(n)] for i in range(e)]
        Vx = [Vx_s[i, :] for i in range(n)]
        Vxx = [[Vxx_s[i * n + j, :] for j in range(n)] for i in range(n)]

        tmp = [pe[a] + mu * eq[a] for a in range(e)]
        tmp2 = [[pex[a][j] + mu * eqx[a][j] for j in range(n)] for a in range(e)]

        # Qx = lx + fxᵀVx + eqxᵀtmp + pexᵀeq
        Qx = []
        for i in range(n):
            s = lx[i]
            for o in range(n):
                s = s + fx[o][i] * Vx[o]
            for a in range(e):
                s = s + eqx[a][i] * tmp[a] + pex[a][i] * eq[a]
            Qx.append(s)
        # Qu = lu + fuᵀVx + equᵀtmp
        Qu = []
        for i in range(m):
            s = lu[i]
            for o in range(n):
                s = s + fu[o][i] * Vx[o]
            for a in range(e):
                s = s + equ[a][i] * tmp[a]
            Qu.append(s)
        # Vxx·fx cache: (Vxx @ fx)[o][j]
        Vfx = [[None] * n for _ in range(n)]
        for o in range(n):
            for j in range(n):
                s = Vxx[o][0] * fx[0][j]
                for r in range(1, n):
                    s = s + Vxx[o][r] * fx[r][j]
                Vfx[o][j] = s
        Vfu = [[None] * m for _ in range(n)]
        for o in range(n):
            for j in range(m):
                s = Vxx[o][0] * fu[0][j]
                for r in range(1, n):
                    s = s + Vxx[o][r] * fu[r][j]
                Vfu[o][j] = s
        # Qxx = lxx + fxᵀ(Vxx fx) + eqxᵀtmp2 + pexᵀeqx [+ Vx·fxx + tmp·eqxx]
        Qxx = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                s = lxx[i][j]
                for o in range(n):
                    s = s + fx[o][i] * Vfx[o][j]
                for a in range(e):
                    s = s + eqx[a][i] * tmp2[a][j] + pex[a][i] * eqx[a][j]
                if second_order:
                    for o in range(n):
                        s = s + Vx[o] * at(fxx_ref, t, (o * n + i) * n + j)
                    for a in range(e):
                        s = s + tmp[a] * at(eqxx_ref, t, (a * n + i) * n + j)
                Qxx[i][j] = s
        # Quu = luu + fuᵀ(Vxx fu) + μ·equᵀequ [+ Vx·fuu + tmp·equu]
        Quu = [[None] * m for _ in range(m)]
        for i in range(m):
            for j in range(m):
                s = luu[i][j]
                for o in range(n):
                    s = s + fu[o][i] * Vfu[o][j]
                for a in range(e):
                    s = s + mu * equ[a][i] * equ[a][j]
                if second_order:
                    for o in range(n):
                        s = s + Vx[o] * at(fuu_ref, t, (o * m + i) * m + j)
                    for a in range(e):
                        s = s + tmp[a] * at(equu_ref, t, (a * m + i) * m + j)
                Quu[i][j] = s
        # Qux = lux + fuᵀ(Vxx fx) + equᵀtmp2 [+ Vx·fux + tmp·equx]
        Qux = [[None] * n for _ in range(m)]
        for i in range(m):
            for j in range(n):
                s = lux[i][j]
                for o in range(n):
                    s = s + fu[o][i] * Vfx[o][j]
                for a in range(e):
                    s = s + equ[a][i] * tmp2[a][j]
                if second_order:
                    for o in range(n):
                        s = s + Vx[o] * at(fux_ref, t, (o * m + i) * n + j)
                    for a in range(e):
                        s = s + tmp[a] * at(equx_ref, t, (a * m + i) * n + j)
                Qux[i][j] = s

        # factor Quu + reg·I, solve for k and K columns
        rhss = [Qu] + [[Qux[i][j] for i in range(m)] for j in range(n)]
        sols, L = _chol_solve_unrolled(Quu, rhss, m, reg)
        k_sol = sols[0]
        K_cols = sols[1:]  # K_cols[j][i] = (Quu⁻¹Qux)[i][j]

        # per-LANE success flag [B]: each batch sample fails independently
        # (reducing over lanes here would let one bad sample poison its
        # whole block).  Carried as a float 0/1 mask — Mosaic mis-lays-out
        # 1-D i1 vectors as fori_loop carries (andi shape mismatch).
        ok_t = jnp.ones_like(L[0][0])
        for i in range(m):
            good = jnp.logical_and(L[i][i] > 0.0, jnp.isfinite(L[i][i]))
            ok_t = ok_t * jnp.where(good, 1.0, 0.0).astype(ok_t.dtype)

        for i in range(m):
            k_out[t, i, :] = -k_sol[i]
            for j in range(n):
                K_out[t, i * n + j, :] = -K_cols[j][i]

        # V updates: Vx' = Qx − Quxᵀ(Quu⁻¹Qu); Vxx' = Qxx − Quxᵀ(Quu⁻¹Qux)
        for i in range(n):
            s = Qx[i]
            for o in range(m):
                s = s - Qux[o][i] * k_sol[o]
            Vx_s[i, :] = s
        for i in range(n):
            for j in range(n):
                s = Qxx[i][j]
                for o in range(m):
                    s = s - Qux[o][i] * K_cols[j][o]
                Vxx_s[i * n + j, :] = s

        return ok * ok_t

    ok0 = jnp.ones_like(ok_out[0, :])  # [B] per-lane float 0/1 mask
    ok = jax.lax.fori_loop(0, T, body, ok0)
    ok_out[0, :] = ok
    # final V (= V at the chunk's first timestep) out, for time-chunked
    # sweeps over horizons whose full [T, rows, B] block exceeds VMEM
    for i in range(n):
        Vx_out[i, :] = Vx_s[i, :]
        for j in range(n):
            Vxx_out[i * n + j, :] = Vxx_s[i * n + j, :]


def backward_sweep_pallas(
    derivs_bl: dict,
    mu: jax.Array,  # [B]
    reg: jax.Array,  # [B]
    *,
    T: int,
    n: int,
    m: int,
    e: int,
    block_b: int = 512,
    interpret: bool = False,
    time_chunk: int | None = None,
    vmem_limit: int | None = None,
):
    """Run the batched backward sweep with batch-on-lanes layout.

    ``derivs_bl`` maps names → arrays shaped [T, rows, B] (matrices
    flattened row-major into the middle axis):
      lx [T,n,B], lu [T,m,B], lxx [T,n*n,B], lux [T,m*n,B], luu [T,m*m,B],
      fx [T,n*n,B], fu [T,n*m,B], eq [T,e,B], eqx [T,e*n,B], equ [T,e*m,B],
      pe [T,e,B], pex [T,e*n,B], lfx [n,B], lfxx [n*n,B];
      with second_order also fxx [T,n*n*n,B], fux [T,n*m*n,B],
      fuu [T,n*m*m,B], eqxx [T,e*n*n,B], equx [T,e*m*n,B], equu [T,e*m*m,B]
      (full-DDP tensor terms, ≙ the reference's rank-3 contractions,
      ddp_bwd.ipp:74-87 via tensor.hpp:179-235).

    Returns (k [T,m,B], K [T,m*n,B], ok [B]).

    ``time_chunk`` splits long horizons into reverse-order chunks of that
    length, carrying (Vx, Vxx) between kernel launches — the whole
    [T, rows, B] block must fit VMEM otherwise.
    """
    B = derivs_bl["lx"].shape[-1]
    assert B % block_b == 0, (B, block_b)

    if time_chunk is not None and time_chunk < T:
        assert T % time_chunk == 0, (T, time_chunk)
        n_chunks = T // time_chunk
        # reverse-time chunk sweep as ONE lax.scan: the kernel body is
        # traced once (the per-chunk Python loop used to re-trace the
        # unrolled kernel n_chunks times — tens of minutes at second-order
        # arm dims), and XLA launches the same compiled kernel per chunk
        time_keys = [k_ for k_ in derivs_bl if k_ not in ("lfx", "lfxx")]
        stacked = {
            k_: derivs_bl[k_]
            .reshape((n_chunks, time_chunk) + derivs_bl[k_].shape[1:])[::-1]
            for k_ in time_keys
        }

        def chunk_step(carry, blk):
            vx, vxx = carry
            sub = dict(blk)
            sub["lfx"], sub["lfxx"] = vx, vxx
            k_c, K_c, ok_c, vx2, vxx2 = _sweep_call(
                sub, mu, reg, T=time_chunk, n=n, m=m, e=e,
                block_b=block_b, interpret=interpret, vmem_limit=vmem_limit,
            )  # fmt: skip
            return (vx2, vxx2), (k_c, K_c, ok_c)

        (_, _), (ks, Ks, oks) = jax.lax.scan(
            chunk_step, (derivs_bl["lfx"], derivs_bl["lfxx"]), stacked
        )
        k = ks[::-1].reshape((T,) + ks.shape[2:])
        K = Ks[::-1].reshape((T,) + Ks.shape[2:])
        return k, K, jnp.all(oks, axis=0)

    k, K, ok, _, _ = _sweep_call(
        derivs_bl, mu, reg, T=T, n=n, m=m, e=e, block_b=block_b,
        interpret=interpret, vmem_limit=vmem_limit,
    )  # fmt: skip
    return k, K, ok


def _sweep_call(
    derivs_bl, mu, reg, *, T, n, m, e, block_b, interpret, vmem_limit=None
):
    """One pallas_call over [0, T); returns (k, K, ok, Vx_final, Vxx_final)."""
    B = derivs_bl["lx"].shape[-1]
    dtype = derivs_bl["lx"].dtype
    grid = (B // block_b,)
    second_order = "fxx" in derivs_bl

    def bs(rows, with_t=True):
        if with_t:
            return pl.BlockSpec(
                (T, rows, block_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        return pl.BlockSpec((rows, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)

    in_specs = [
        bs(n), bs(m), bs(n * n), bs(m * n), bs(m * m),
        bs(n * n), bs(n * m),
        bs(e), bs(e * n), bs(e * m), bs(e), bs(e * n),
        bs(1, with_t=False), bs(1, with_t=False),
        bs(n, with_t=False), bs(n * n, with_t=False),
    ]  # fmt: skip
    inputs = [
        derivs_bl["lx"], derivs_bl["lu"], derivs_bl["lxx"], derivs_bl["lux"],
        derivs_bl["luu"], derivs_bl["fx"], derivs_bl["fu"],
        derivs_bl["eq"], derivs_bl["eqx"], derivs_bl["equ"],
        derivs_bl["pe"], derivs_bl["pex"],
        mu[None, :], reg[None, :], derivs_bl["lfx"], derivs_bl["lfxx"],
    ]  # fmt: skip
    if second_order:
        in_specs += [
            bs(n * n * n), bs(n * m * n), bs(n * m * m),
            bs(e * n * n), bs(e * m * n), bs(e * m * m),
        ]  # fmt: skip
        inputs += [
            derivs_bl["fxx"], derivs_bl["fux"], derivs_bl["fuu"],
            derivs_bl["eqxx"], derivs_bl["equx"], derivs_bl["equu"],
        ]  # fmt: skip
    out_specs = (
        bs(m), bs(m * n), bs(1, with_t=False),
        bs(n, with_t=False), bs(n * n, with_t=False),
    )  # fmt: skip
    out_shape = (
        jax.ShapeDtypeStruct((T, m, B), dtype),
        jax.ShapeDtypeStruct((T, m * n, B), dtype),
        jax.ShapeDtypeStruct((1, B), dtype),
        jax.ShapeDtypeStruct((n, B), dtype),
        jax.ShapeDtypeStruct((n * n, B), dtype),
    )

    kernel = functools.partial(
        _bwd_kernel, T=T, n=n, m=m, e=e, second_order=second_order
    )
    params = {}
    if vmem_limit is not None:
        # second-order arm dims carry ~4.5k input rows/step: a raised scoped
        # limit lets the whole horizon ride one launch instead of chunk-of-2
        # splits (8× the launches AND 8× the kernel-body traces)
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit
        )
    k, K, ok, vx, vxx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, block_b), dtype),
            pltpu.VMEM((n * n, block_b), dtype),
        ],
        interpret=interpret,
        **params,
    )(*inputs)
    return k, K, ok[0] > 0.5, vx, vxx


def pack_batch_last(derivs, mult_val, mult_jac, second_order: bool = False):
    """[B, T, …] solver-layout Derivs → the kernel's [T, rows, B] dict.

    With ``second_order`` the six rank-3 tensor blocks ride along for the
    full-DDP kernel path."""

    def mv(x, rows):
        # [B, T, ...] → [T, rows, B]
        b = x.shape[0]
        t = x.shape[1]
        return jnp.transpose(x.reshape(b, t, rows), (1, 2, 0))

    def mv_const(x, rows):
        # [B, ...] → [rows, B]
        return jnp.transpose(x.reshape(x.shape[0], rows), (1, 0))

    n = derivs.lx.shape[-1]
    m = derivs.lu.shape[-1]
    e = derivs.eq.shape[-1]
    out = dict(
        lx=mv(derivs.lx, n), lu=mv(derivs.lu, m),
        lxx=mv(derivs.lxx, n * n), lux=mv(derivs.lux, m * n), luu=mv(derivs.luu, m * m),
        fx=mv(derivs.fx, n * n), fu=mv(derivs.fu, n * m),
        eq=mv(derivs.eq, e), eqx=mv(derivs.eqx, e * n), equ=mv(derivs.equ, e * m),
        pe=mv(mult_val, e), pex=mv(mult_jac, e * n),
        lfx=mv_const(derivs.lfx, n), lfxx=mv_const(derivs.lfxx, n * n),
    )  # fmt: skip
    if second_order:
        out.update(
            fxx=mv(derivs.fxx, n * n * n), fux=mv(derivs.fux, n * m * n),
            fuu=mv(derivs.fuu, n * m * m),
            eqxx=mv(derivs.eqxx, e * n * n), equx=mv(derivs.equx, e * m * n),
            equu=mv(derivs.equu, e * m * m),
        )  # fmt: skip
    return out
