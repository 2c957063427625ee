"""Test harness: 8 virtual CPU devices so data-parallel sharding and the
multi-chip program are exercised without TPU hardware (SURVEY.md §4
'distributed without a cluster').

Must run before any module initializes a JAX backend.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
