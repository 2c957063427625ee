"""Device-resident dataset: the training split lives in HBM, and batch
assembly — index draw, random crop, horizontal flip, caption window-average,
wrong-pair selection — runs *inside the compiled training step*.

The reference assembles every batch on the host with numpy and feeds it
through the session boundary each step (SURVEY.md §3.1 ``dataset.next_batch``
+ ``feed_dict``).  A TPU-native framework shouldn't ship megabytes of uint8
per step over PCIe (or a dev tunnel) when the whole split fits HBM:
Oxford-102's 76-px pickles are ~140 MB and even CUB's 304-px split is
~3.3 GB against 16 GB/chip on v5e.  Staging the raw arrays once and deriving
each batch from ``fold_in(seed, step)`` on device removes the per-step
host→HBM transfer entirely — and makes the *data* stream exactly resumable,
which the host pipeline's thread timing never was.

Multi-chip layout: the dataset arrays are **replicated** per device (they fit
per-chip HBM by the same argument) while the *sampled batch* is sharded over
the mesh's data axis — so every gather is device-local and no collective
touches the input path.  Datasets larger than HBM keep using the host
pipeline (`data/pipeline.py`), which stays the fallback.

Sampling semantics match ``TextDataset.next_batch`` (data/textdataset.py):

* ``real``: uniform example draw, random crop + flip, served uint8 (the
  train step normalizes to the generator's tanh range on device),
* ``wrong``: **exactly uniform over the examples of a different class** —
  not rejection-sampled.  At staging time the examples are sorted by class
  into a permutation ``perm``; for an example of class c (occupying
  ``perm[s : s+m]``) the n−m non-c examples are ``perm[(s+m+u) mod n]`` for
  u ∈ [0, n−m), so one bounded ``randint`` + one gather replaces the
  reference's unbounded host rejection loop,
* ``emb``: ``window`` distinct captions per image, averaged (reference
  ``sample_embeddings``); the without-replacement draw is argsort of a row
  of uniform keys.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from text_to_image_tpu.parallel.mesh import MeshEnv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceData:
    """HBM-resident split + the class tables the wrong-pair draw needs."""

    images: jax.Array       # [N, S, S, 3] uint8 (S = crop source size)
    embeddings: jax.Array   # [N, C, E] float32 (C captions per image)
    class_perm: jax.Array   # [N] int32 — example indices sorted by class id
    other_start: jax.Array  # [N] int32 — per example: (start+count) of its
    # class inside class_perm, i.e. where the OTHER-class ring begins
    other_count: jax.Array  # [N] int32 — per example: N − |its class|


def class_tables(class_ids: np.ndarray):
    """Host-side precompute for the exact-uniform wrong-pair draw."""
    cls = np.asarray(class_ids)
    n = len(cls)
    perm = np.argsort(cls, kind="stable")
    uniq, starts, counts = np.unique(cls[perm], return_index=True,
                                     return_counts=True)
    pos = {c: i for i, c in enumerate(uniq)}
    at = np.array([pos[c] for c in cls])
    count = counts[at]
    if (count == n).any():
        raise ValueError("a class covers the whole dataset — no wrong pair "
                         "exists (matching-aware loss needs >=2 classes)")
    other_start = (starts[at] + count) % n
    return (perm.astype(np.int32), other_start.astype(np.int32),
            (n - count).astype(np.int32))


def stage(dataset, env: Optional[MeshEnv] = None) -> DeviceData:
    """One-time host→HBM staging of a TextDataset/SyntheticDataset split,
    replicated over the mesh (single-device meshes take a plain put — the
    trivially-sharded put is pathologically slow on some platforms, see
    data/pipeline.py)."""
    perm, other_start, other_count = class_tables(dataset.class_ids)
    host = DeviceData(
        images=np.ascontiguousarray(dataset.images),
        embeddings=np.ascontiguousarray(dataset.embeddings, dtype=np.float32),
        class_perm=perm, other_start=other_start, other_count=other_count)
    if env is None:
        return jax.tree.map(jax.device_put, host)
    if env.mesh.devices.size == 1:
        dev = env.mesh.devices.reshape(-1)[0]
        return jax.tree.map(lambda x: jax.device_put(x, dev), host)
    return jax.device_put(host, env.replicated())


def nbytes(dataset) -> int:
    """HBM footprint of staging `dataset` (images uint8 + embeddings f32)."""
    return (int(np.prod(dataset.images.shape))
            + int(np.prod(dataset.embeddings.shape)) * 4
            + 3 * 4 * len(dataset.class_ids))


# --- the jit-traceable samplers ---------------------------------------------


def _crop_flip(images: jax.Array, idx: jax.Array, size: int, key: jax.Array,
               random_crop: bool, random_flip: bool) -> jax.Array:
    """Gather + per-example random crop + horizontal flip, all uint8."""
    src = images.shape[1]
    gathered = images[idx]                        # [B, S, S, 3]
    kc, kf = jax.random.split(key)
    b = idx.shape[0]
    if src != size:
        if random_crop:
            off = jax.random.randint(kc, (2, b), 0, src - size + 1)
            ys, xs = off[0], off[1]
        else:
            ys = xs = jnp.full((b,), (src - size) // 2, jnp.int32)
        gathered = jax.vmap(
            lambda img, y, x: jax.lax.dynamic_slice(
                img, (y, x, 0), (size, size, 3)))(gathered, ys, xs)
    if random_flip:
        flips = jax.random.bernoulli(kf, 0.5, (b,))
        gathered = jnp.where(flips[:, None, None, None],
                             gathered[:, :, ::-1, :], gathered)
    return gathered


def _avg_captions(embeddings: jax.Array, idx: jax.Array, key: jax.Array,
                  window: int) -> jax.Array:
    rows = embeddings[idx]                        # [B, C, E]
    c = rows.shape[1]
    if window >= c:
        return rows.mean(axis=1)
    picks = jnp.argsort(jax.random.uniform(key, (rows.shape[0], c)),
                        axis=1)[:, :window]       # distinct captions per row
    return jnp.take_along_axis(rows, picks[:, :, None], axis=1).mean(axis=1)


def sample_batch(data: DeviceData, key: jax.Array, batch_size: int,
                 image_size: int, window: int, random_crop: bool,
                 random_flip: bool) -> Dict[str, jax.Array]:
    """One ``next_batch``-shaped batch, derived entirely from `key`."""
    n = data.images.shape[0]
    kidx, kw, kreal, kwrong, kcap = jax.random.split(key, 5)
    idx = jax.random.randint(kidx, (batch_size,), 0, n)
    u = jax.random.randint(kw, (batch_size,), 0, data.other_count[idx])
    wrong = data.class_perm[(data.other_start[idx] + u) % n]
    return {
        "real": _crop_flip(data.images, idx, image_size, kreal,
                           random_crop, random_flip),
        "wrong": _crop_flip(data.images, wrong, image_size, kwrong,
                            random_crop, random_flip),
        "emb": _avg_captions(data.embeddings, idx, kcap, window),
    }


def sample_stacked(data: DeviceData, key: jax.Array, n_critic: int,
                   batch_size: int, image_size: int, window: int,
                   random_crop: bool, random_flip: bool,
                   env: Optional[MeshEnv] = None) -> Dict[str, jax.Array]:
    """The train step's input: [K, B, ...] with a fresh batch per critic
    update (SURVEY.md §3.2).  With a multi-device `env`, the batch is
    constrained to the stacked data-axis sharding so XLA partitions the
    gathers per device instead of replicating the whole global batch."""
    keys = jax.random.split(key, n_critic)
    batch = jax.vmap(lambda k: sample_batch(
        data, k, batch_size, image_size, window, random_crop, random_flip)
    )(keys)
    if env is not None and env.mesh.devices.size > 1:
        batch = jax.lax.with_sharding_constraint(batch, env.stacked_batch())
    return batch


# --- sharded-resident middle tier (SURVEY §5.8, round-4 VERDICT #9) ---------
#
# Datasets too big for ONE chip's HBM but fitting the data-axis devices'
# aggregate HBM: the example dimension is sharded over the batch axes and
# each device draws its slice of the global batch from ITS OWN shard — every
# gather stays device-local, no collective touches the input path (the same
# property the replicated tier has, at 1/D the per-chip footprint).
#
# Semantics deviation, stated honestly: the replicated tier draws every
# batch element uniformly from the WHOLE split; this tier draws uniformly
# within per-device shards (examples are shuffled to shards once at staging,
# so shard statistics match the split — the standard sharded-data-loader
# semantics of every DP framework).  The stream is exactly resumable for a
# fixed mesh but is a different stream on a different mesh size.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedDeviceData:
    """Per-device-sharded split: example dim sharded over the batch axes.

    Shard d owns rows [d·Nl, (d+1)·Nl) of ``images``/``embeddings``; the
    class tables are per-shard (row d indexes WITHIN shard d)."""

    images: jax.Array       # [D·Nl, S, S, 3] uint8, dim 0 sharded
    embeddings: jax.Array   # [D·Nl, C, E] float32, dim 0 sharded
    class_perm: jax.Array   # [D, Nl] int32, dim 0 sharded
    other_start: jax.Array  # [D, Nl] int32
    other_count: jax.Array  # [D, Nl] int32


def _batch_axis_names(env: MeshEnv):
    return (("slice", "data") if "slice" in env.mesh.axis_names
            else ("data",))


def stage_sharded(dataset, env: MeshEnv, seed: int = 0) -> ShardedDeviceData:
    """Shuffle examples onto D = slice·data shards (wrap-padding the tail so
    shards are equal-sized) and stage each shard on its devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = env.slice_size * env.data_size
    n = len(dataset.class_ids)
    rng = np.random.default_rng(seed)
    nl = -(-n // d)                      # ceil — tail wraps (mild duplication)
    order = rng.permutation(n)
    idx = order[np.arange(d * nl) % n]
    perms, starts, counts = [], [], []
    for s in range(d):
        shard_cls = np.asarray(dataset.class_ids)[idx[s * nl:(s + 1) * nl]]
        try:
            p, st, ct = class_tables(shard_cls)
        except ValueError as e:
            raise ValueError(
                f"shard {s}/{d} is single-class after shuffling — dataset "
                f"too small/skewed for the sharded tier; use the host "
                f"pipeline") from e
        perms.append(p), starts.append(st), counts.append(ct)

    axes = P(_batch_axis_names(env))
    row = NamedSharding(env.mesh, axes)                      # dim-0 sharded
    host = ShardedDeviceData(
        images=np.ascontiguousarray(np.asarray(dataset.images)[idx]),
        embeddings=np.ascontiguousarray(
            np.asarray(dataset.embeddings)[idx], dtype=np.float32),
        class_perm=np.stack(perms), other_start=np.stack(starts),
        other_count=np.stack(counts))
    return jax.tree.map(lambda x: jax.device_put(x, row), host)


def sample_stacked_sharded(data: ShardedDeviceData, key: jax.Array,
                           n_critic: int, batch_size: int, image_size: int,
                           window: int, random_crop: bool, random_flip: bool,
                           env: MeshEnv) -> Dict[str, jax.Array]:
    """[K, B, ...] batch where device d's B/D slice is drawn from shard d —
    a shard_map over the batch axes; the model axis (unmentioned) computes
    replicated duplicates from the same per-shard key, so outputs are
    model-invariant by construction."""
    from jax.sharding import PartitionSpec as P

    names = _batch_axis_names(env)
    d = env.slice_size * env.data_size
    if batch_size % d:
        raise ValueError(f"batch_size {batch_size} not divisible by the "
                         f"{d} batch-axis devices")
    local_b = batch_size // d
    row, tab = P(names), P(names)
    out = P(None, names)

    def local(imgs, embs, perm, ostart, ocount, k):
        shard = (jax.lax.axis_index(names[0]) if len(names) == 1 else
                 jax.lax.axis_index(names[0]) * env.data_size
                 + jax.lax.axis_index(names[1]))
        local_data = DeviceData(images=imgs, embeddings=embs,
                                class_perm=perm[0], other_start=ostart[0],
                                other_count=ocount[0])
        ks = jax.random.split(jax.random.fold_in(k, shard), n_critic)
        return jax.vmap(lambda kk: sample_batch(
            local_data, kk, local_b, image_size, window, random_crop,
            random_flip))(ks)

    return jax.shard_map(
        local, mesh=env.mesh,
        in_specs=(row, row, tab, tab, tab, P()),
        out_specs={"real": out, "wrong": out, "emb": out},
        check_vma=False,  # randomness via fold_in(axis_index) — model-axis
        # invariance holds by construction but is opaque to the checker
    )(data.images, data.embeddings, data.class_perm, data.other_start,
      data.other_count, key)
