"""Dataset-finetuned classifier for Inception-score evaluation.

The reference's IS protocol uses an Inception network finetuned on the
evaluation dataset (SURVEY.md §3.5).  This module provides the finetuning
step for any classifier in our functional form — by default the
self-contained `simple_classifier` (offline-friendly); the same trainer
finetunes the full InceptionV3 (`eval/inception_v3.py`) when its weights are
available.  Training is one jitted Adam step on device.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from text_to_image_tpu.eval import inception as E
from text_to_image_tpu.utils import prng


def train_classifier(images_u8: np.ndarray, class_ids: np.ndarray,
                     num_classes: int, steps: int = 500,
                     batch_size: int = 64, lr: float = 1e-3,
                     width: int = 32, seed: int = 0,
                     init_fn=None, apply_fn=None
                     ) -> Tuple[Dict, float]:
    """Supervised finetune on (image, class) pairs; returns (params,
    final_accuracy).  images_u8 [N,H,W,3] uint8; normalization to tanh range
    happens on device (matches the generator's output range at eval time)."""
    init_fn = init_fn or (lambda k: E.simple_classifier_init(
        k, num_classes, width))
    apply_fn = apply_fn or E.simple_classifier_apply

    key = prng.base_key(seed)
    params = jax.jit(init_fn)(key)
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, imgs, labels):
        def loss_fn(p):
            logits = apply_fn(p, imgs.astype(jnp.float32) / 127.5 - 1.0)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return ce, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, acc

    rng = np.random.default_rng(seed)
    acc = 0.0
    for i in range(steps):
        idx = rng.integers(0, len(images_u8), batch_size)
        params, opt, loss, acc = train_step(
            params, opt, jnp.asarray(images_u8[idx]),
            jnp.asarray(class_ids[idx]))
    return params, float(acc)


def make_classifier_fn(params, apply_fn=None) -> Callable:
    apply_fn = apply_fn or E.simple_classifier_apply

    @jax.jit
    def classifier(images):
        return apply_fn(params, images)
    return classifier
