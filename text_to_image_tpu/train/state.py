"""Train state: one pytree carrying both networks, their norm state, both
optimizer states, frozen auxiliary params (Stage-II's Stage-I generator) and
the step counter.

The whole struct is donated into the jitted train step, so parameters and
optimizer moments update in place in HBM (no reallocation per step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    g_params: Any
    g_state: Any
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array                      # int32 scalar
    aux: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # aux['stage1_g_params'/'stage1_g_state']: frozen Stage-I G for Stage-II

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


def new_step_counter() -> jax.Array:
    return jnp.zeros((), jnp.int32)
