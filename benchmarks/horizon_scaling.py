"""Backward-pass scaling with horizon T: Pallas in-kernel sweep (time-
chunked, O(T) serial inside few launches) vs associative-scan Riccati
(O(log T) depth, XLA) vs the XLA scan sweep (O(T) launches).

SURVEY.md §5 "long-context": the reference iterates the horizon serially;
the TPU-native options trade serial depth against per-step width.  This
records where each wins (see docs/DESIGN.md for the measured table).
Appends JSON lines to benchmarks/results.jsonl.  Run SOLO (the axon tunnel
serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import pendulum_problem, record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()


def main():
    from ddp_tpu.solver import al as al_mod
    from ddp_tpu.solver.batched import _backward_multi_reg, _backward_pallas_levels
    from ddp_tpu.solver.parallel_riccati import backward_pass_assoc

    dtype = jnp.float32
    B = 1024
    rng = np.random.default_rng(0)

    for T in (32, 128, 512, 2048):
        prob = pendulum_problem(T, second_order=False, dtype=dtype)
        x0s = jnp.asarray(
            np.stack([rng.uniform(-1, 1, B), np.zeros(B)], 1), dtype
        )
        us = jnp.zeros((B, T, 1), dtype)
        xs = jax.vmap(prob.rollout)(x0s, us)
        derivs = jax.vmap(prob.derivatives)(xs, us)
        mults = jax.vmap(lambda x: al_mod.init_multipliers(prob, x))(xs)
        mu = jnp.full((B,), 1e4, dtype)
        reg = jnp.zeros((B,), dtype)

        fns = {
            "xla_sweep": jax.jit(
                lambda d: jax.vmap(
                    lambda dd, v, j, m, r: _backward_multi_reg(dd, v, j, m, r)
                )(d, mults.val, mults.jac, mu, reg)[0]
            ),
            "pallas_sweep": jax.jit(
                lambda d: _backward_pallas_levels(d, mults.val, mults.jac, mu, reg)[0]
            ),
            "assoc_scan": jax.jit(
                lambda d: jax.vmap(backward_pass_assoc)(
                    d, mults.val, mults.jac, mu, reg
                )[0]
            ),
        }
        for name, fn in fns.items():
            try:
                r = fn(derivs)
                jax.block_until_ready(r)
                N = 10
                t0 = time.perf_counter()
                outs = [fn(derivs) for _ in range(N)]
                jax.block_until_ready(outs[-1])
                ms = (time.perf_counter() - t0) * 1e3 / N
                record("bwd_horizon_scaling", backend=name, T=T, B=B,
                       ms=round(ms, 3))
            except Exception as e:  # noqa: BLE001
                record("bwd_horizon_scaling", backend=name, T=T, B=B,
                       error=f"{type(e).__name__}: {e}"[:200])


if __name__ == "__main__":
    main()
