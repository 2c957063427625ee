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
    """Per-example ε ∈ U[0,1] for WGAN-GP interpolation, broadcastable to NHWC.

    Sampled 1-D then unsqueezed: sampling directly at (B,1,1,1) puts the
    uniform's internal scalar-constant broadcasts at that rank, and the SPMD
    partitioner cannot propagate shardings across the singleton dims (the
    'Involuntary full rematerialization' warnings in the round-2 multichip
    dryrun log).  stop_gradient keeps the sampler out of the GP's
    double-backprop linearization for the same reason."""
    e = jax.lax.stop_gradient(jax.random.uniform(key, (batch,), dtype=dtype))
    return e[:, None, None, None]
