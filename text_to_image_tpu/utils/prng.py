"""PRNG discipline.

The reference relies on TF1 graph-level + numpy global seeds.  Here randomness
is explicit: a single base key derived from ``cfg.seed``, with per-step keys
obtained via ``fold_in`` so the training step is a pure function of
``(state, batch, step)`` — reproducible, resumable, and identical regardless
of host-loop restarts.
"""

from __future__ import annotations

import zlib
from typing import Tuple

import jax
import jax.numpy as jnp


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Key for a given global step: independent of how we got to `step`."""
    return jax.random.fold_in(key, step)


def split_tree(key: jax.Array, names: Tuple[str, ...]):
    """Named split: returns a dict of independent keys, order-insensitive."""
    # crc32 (not builtin hash) so key derivation is stable across processes
    return {n: jax.random.fold_in(key, zlib.crc32(n.encode()) % (2**31)) for n in names}


def uniform_eps(key: jax.Array, batch: int, dtype=jnp.float32) -> jax.Array:
    """Per-example ε ∈ U[0,1] for WGAN-GP interpolation, broadcastable to NHWC."""
    return jax.random.uniform(key, (batch, 1, 1, 1), dtype=dtype)
