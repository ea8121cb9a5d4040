"""Test config: CPU backend with 8 virtual devices (for mesh/collective tests
without a TPU pod) and float64 enabled (float64-on-CPU plays the oracle role
that MPFR-1000 plays in the reference tests, SURVEY.md §4).

Note: this environment force-registers an experimental TPU plugin platform
regardless of JAX_PLATFORMS, so we must override via jax.config at runtime
(before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the arm/solver test programs are compile-heavy
# (jacfwd over RNEA + while_loop solvers); cached, a full-suite rerun drops
# from minutes of XLA compile time to seconds.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
