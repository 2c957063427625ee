"""Batched on-device inference: fixed-z sample grids, latent interpolation
and text-embedding interpolation sweeps (reference ``--train=False``
evaluator path, SURVEY.md §3.4; capability #5 in BASELINE.json).

The text encoder never runs here — embeddings are precomputed char-CNN-RNN
vectors served by the dataset, exactly like the reference.

Generators sample in train mode (batch statistics): the standard DCGAN-lineage
sampling convention the reference follows.
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text_to_image_tpu.config import Config
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L

if TYPE_CHECKING:  # annotation-only: avoids eval ↔ train circular import
    from text_to_image_tpu.train.state import TrainState


def make_generator_fn(cfg: Config, train_mode: bool = True) -> Callable:
    """jitted ``gen(g_params, g_state, aux, z, emb, key) -> images[B,r,r,3]``.
    Cached per (cfg.compute_key(), mode) so trainers, eval paths and tests
    share one compiled program."""
    return _make_generator_fn(cfg.compute_key(), train_mode)


@functools.lru_cache(maxsize=64)
def _make_generator_fn(cfg: Config, train_mode: bool) -> Callable:
    bundle = get_model(cfg)
    policy = L.Policy.from_str(cfg.dtype)

    from text_to_image_tpu.ops.pallas import fused

    @jax.jit
    def _gen(g_params, g_state, aux, z, emb, key):
        img, _, _ = bundle.gen_apply(g_params, g_state, aux, z, emb, key,
                                     train_mode, policy)
        return img.astype(jnp.float32)

    def gen(g_params, g_state, aux, z, emb, key):
        # kernel dispatch reads contextvars at TRACE time; bind the mode to
        # cfg.use_pallas (the lru cache key) so the compiled program matches
        # its key regardless of the ambient mode — same fix as train.steps —
        # and mark the trace forward-only so auto dispatch may use the wider
        # inference win table (large-map up-blocks win standalone but lose
        # inside training graphs; see fused._upconv_wins)
        with fused.use_pallas(cfg.use_pallas), fused.inference():
            return _gen(g_params, g_state, aux, z, emb, key)

    return gen


def eval_g_params(ts: "TrainState"):
    """Generator params for eval/sampling: the EMA weight average when the
    trainer maintains one (train.ema_decay > 0 — Karras PGGAN recipe), else
    the live params."""
    return ts.aux.get("ema_g_params", ts.g_params)


def _run(gen, ts: "TrainState", z, emb, key) -> np.ndarray:
    return np.asarray(jax.device_get(
        gen(eval_g_params(ts), ts.g_state, ts.aux, jnp.asarray(z),
            jnp.asarray(emb), key)))


def sample_grid(gen, ts: "TrainState", cfg: Config, embeddings: np.ndarray,
                key) -> np.ndarray:
    """One image per embedding with fresh z — the training-time sample grid."""
    n = len(embeddings)
    z = jax.random.normal(jax.random.fold_in(key, 0), (n, cfg.gan.z_dim))
    return _run(gen, ts, z, embeddings, jax.random.fold_in(key, 1))


def latent_interpolation_grid(gen, ts: "TrainState", cfg: Config,
                              embeddings: np.ndarray, n_steps: int, key
                              ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Rows: one caption each; columns: z₁→z₂ linear sweep (SURVEY §3.4)."""
    rows = len(embeddings)
    kz1, kz2, kg = jax.random.split(key, 3)
    z1 = jax.random.normal(kz1, (rows, 1, cfg.gan.z_dim))
    z2 = jax.random.normal(kz2, (rows, 1, cfg.gan.z_dim))
    alphas = jnp.linspace(0.0, 1.0, n_steps).reshape(1, n_steps, 1)
    z = ((1 - alphas) * z1 + alphas * z2).reshape(rows * n_steps, -1)
    emb = np.repeat(embeddings, n_steps, axis=0)
    imgs = _run(gen, ts, z, emb, kg)
    return imgs, (rows, n_steps)


def text_interpolation_grid(gen, ts: "TrainState", cfg: Config,
                            emb_a: np.ndarray, emb_b: np.ndarray,
                            n_steps: int, key
                            ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Rows: fixed z each; columns: β sweep between two captions' embeddings
    (GAN-INT-style manifold walk, β ∈ [0,1])."""
    rows = len(emb_a)
    kz, kg = jax.random.split(key)
    z = jax.random.normal(kz, (rows, 1, cfg.gan.z_dim))
    z = jnp.broadcast_to(z, (rows, n_steps, cfg.gan.z_dim)).reshape(-1, cfg.gan.z_dim)
    betas = np.linspace(0.0, 1.0, n_steps, dtype=np.float32).reshape(1, n_steps, 1)
    emb = ((1 - betas) * emb_a[:, None, :] + betas * emb_b[:, None, :])
    emb = emb.reshape(rows * n_steps, -1)
    imgs = _run(gen, ts, z, emb, kg)
    return imgs, (rows, n_steps)
