"""Test harness: 8 virtual CPU devices so data-parallel sharding and the
multi-chip program are exercised without TPU hardware (SURVEY.md §4
'distributed without a cluster').

Must run before any module initializes a JAX backend.

A persistent XLA compilation cache under ``.jax_cache/`` makes repeat suite
runs fast on this 1-core host (a cold train-step compile is ~25-70 s; a
cache hit is ~2-4 s).  First run after a clean checkout is still cold.
Set ``T2I_NO_COMPILE_CACHE=1`` to disable (e.g. when bisecting compiler
behavior).  XLA logs benign `prefer-no-scatter/gather` feature-mismatch
warnings when loading AOT results — those are LLVM tuning hints, not CPU
instructions.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

if not os.environ.get("T2I_NO_COMPILE_CACHE"):
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
