"""Device mesh + sharding layer.

The reference is single-process single-device (SURVEY.md §2 parallelism
inventory: no DP/TP/PP).  Here distribution is first-class and TPU-idiomatic:

* a 2-D ``(data, model)`` `jax.sharding.Mesh` over all local devices,
* the global batch is sharded over ``data`` — gradient all-reduce lowers to an
  XLA AllReduce over ICI inside a slice,
* the widest matmuls (generator stem FC, text compressors) may shard their
  output features over ``model`` (tensor parallelism); these models are small
  so ``model=1`` is the production default, but the axis is real and exercised
  by the multi-chip dry-run.

Everything is expressed with `NamedSharding` under `jax.jit`, letting XLA
insert/elide collectives (scaling-book recipe: pick a mesh, annotate
shardings, let the compiler place the collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshEnv:
    """A mesh plus the shardings the training program uses."""

    mesh: Mesh

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]

    def batch(self) -> NamedSharding:
        """Leading-axis (batch) sharding over the data axis."""
        return NamedSharding(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def model_cols(self) -> NamedSharding:
        """Shard a weight matrix's output features over the model axis."""
        return NamedSharding(self.mesh, P(None, "model"))


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshEnv:
    """Build a (data, model) mesh. data=-1 → all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return MeshEnv(mesh=Mesh(arr, ("data", "model")))


def shard_batch(env: MeshEnv, tree):
    """Place a host batch on device, sharded over the data axis."""
    return jax.device_put(tree, env.batch())


def replicated(env: MeshEnv, tree):
    """Place a pytree on device fully replicated."""
    return jax.device_put(tree, env.replicated())


def batch_sharding(env: MeshEnv):
    return env.batch()


def param_sharding(env: MeshEnv, params, tp_paths: Sequence[str] = ()):
    """Sharding pytree for params: replicated, except weights whose dotted
    path matches an entry of `tp_paths`, which shard output-features over
    the model axis."""
    repl = env.replicated()
    cols = env.model_cols()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )

    shardings = {}
    for path, leaf in flat:
        ps = path_str(path)
        use_tp = any(t in ps for t in tp_paths) and getattr(leaf, "ndim", 0) == 2
        shardings[ps] = cols if use_tp else repl

    def pick(path, leaf):
        return shardings[path_str(path)]

    return jax.tree_util.tree_map_with_path(pick, params)
