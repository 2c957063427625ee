"""Device mesh + sharding layer.

The reference is single-process single-device (SURVEY.md §2 parallelism
inventory: no DP/TP/PP).  Here distribution is first-class and TPU-idiomatic:

* a ``(data, model)`` `jax.sharding.Mesh` over all local devices — or
  ``(slice, data, model)`` when ``slices > 1`` (multi-slice pods),
* the global batch is sharded over ``data`` (and ``slice``) — gradient
  all-reduce lowers to an XLA AllReduce over ICI inside a slice; with a
  ``slice`` axis the cross-slice component of the reduction rides DCN
  (slower links carry only the already-reduced per-slice partials —
  the standard hierarchical-DP layout),
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
    def slice_size(self) -> int:
        return self.mesh.shape.get("slice", 1)

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]

    @property
    def _batch_axes(self):
        return (("slice", "data") if "slice" in self.mesh.axis_names
                else "data")

    def batch(self) -> NamedSharding:
        """Leading-axis (batch) sharding over the data(+slice) axes."""
        return NamedSharding(self.mesh, P(self._batch_axes))

    def stacked_batch(self) -> NamedSharding:
        """Per-critic-stacked batch [K, B, ...]: axis 1 is the batch axis."""
        return NamedSharding(self.mesh, P(None, self._batch_axes))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def model_cols(self) -> NamedSharding:
        """Shard a weight matrix's output features over the model axis."""
        return NamedSharding(self.mesh, P(None, "model"))


def create_mesh(
    data: int = -1,
    model: int = 1,
    slices: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshEnv:
    """Build a (data, model) mesh — or (slice, data, model) when
    ``slices > 1``.  data=-1 → all remaining devices.

    On real multi-slice pods, devices are grouped by their ``slice_index``
    so the mesh's ``slice`` axis aligns with the DCN boundary (cross-slice
    traffic on DCN, in-slice on ICI); elsewhere (single slice, virtual CPU
    meshes) the device list is split evenly in order."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % slices != 0:
        raise ValueError(f"{n} devices not divisible by slices={slices}")
    per_slice = n // slices
    if data == -1:
        if per_slice % model != 0:
            raise ValueError(
                f"{per_slice} devices/slice not divisible by model={model}")
        data = per_slice // model
    if slices * data * model != n:
        raise ValueError(f"mesh {slices}x{data}x{model} != {n} devices")

    if slices > 1:
        idx = {d: getattr(d, "slice_index", None) for d in devices}
        if all(v is not None for v in idx.values()) and \
                len({v for v in idx.values()}) == slices:
            devices = sorted(devices, key=lambda d: (idx[d], d.id))
        arr = np.asarray(devices).reshape(slices, data, model)
        return MeshEnv(mesh=Mesh(arr, ("slice", "data", "model")))
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
