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
