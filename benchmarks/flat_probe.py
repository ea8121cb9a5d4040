"""Probe: per-op issue cost of a [B]-lane whole-solve kernel shape.

Decides VERDICT r4 item 3's architecture before building it: a fused
flat-lane solve kernel runs ~8 iterations x T steps of tiny [B]-vector ops
in one launch.  Whether that beats the XLA scan chain (~1,500 dependent
launches, 3.43 ms at B=4096) depends entirely on Mosaic's per-op overhead
at wide lane blocks — measured here with a mock op-soup kernel whose
structure (op count, dependency chain, fori_loop over t, unrolled
iterations) mirrors the planned kernel, plus the matching XLA scan.

Run SOLO (the tunnel serializes TPU clients).
"""

from __future__ import annotations

import time

from _common import record, setup_cache

import jax
import jax.numpy as jnp
import numpy as np

setup_cache()

T, ITERS = 32, 8


def main():
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mock_kernel(x_ref, out_ref, *, n_iters, n_t, ops_per_step):
        # dependency-chained op soup: per "iteration", a reverse sweep and a
        # forward sweep of `ops_per_step` dependent VPU ops each on [B] lanes
        x = x_ref[0, :]
        y = x_ref[1, :]
        for _ in range(n_iters):
            def sweep(t, carry):
                a, b = carry
                for i in range(ops_per_step // 4):
                    a = a * b + 0.5
                    b = b - a * 0.25
                    a = jnp.where(b > 0, a, -a)
                    b = b + jnp.sin(a) * 0.01
                return a, b

            x, y = jax.lax.fori_loop(0, n_t, sweep, (x, y))
        out_ref[0, :] = x
        out_ref[1, :] = y

    for B in (4096, 8192):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, B)), jnp.float32)
        for ops in (32, 64, 128):
            kern = functools.partial(
                mock_kernel, n_iters=ITERS, n_t=2 * T, ops_per_step=ops
            )
            f = jax.jit(
                lambda x_, k=kern: pl.pallas_call(
                    k,
                    out_shape=jax.ShapeDtypeStruct((2, B), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(x_)
            )
            r = f(x); jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(50):
                r = f(x)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 50
            total_ops = ITERS * 2 * T * ops
            cyc = dt * 940e6 / total_ops  # cycles/op at ~940 MHz
            record(
                "flat_probe", B=B, ops_per_step=ops, total_ops=total_ops,
                us=round(dt * 1e6, 1), cycles_per_op=round(cyc, 1),
                solves_per_s_if_this_were_a_solve=round(B / dt, 0),
            )  # fmt: skip


if __name__ == "__main__":
    main()
