"""Inception-score evaluation (reference SURVEY.md §3.5; protocol from
Salimans et al. / StackGAN: generate ~30k images from test captions, run a
dataset-finetuned Inception classifier, IS = exp(E_x KL(p(y|x) ‖ p(y))) over
10 splits, report mean ± std).

The classifier is pluggable: any jit-able ``images[B,H,W,3] (tanh range) →
logits[B, n_classes]``.  The reference uses a TF1 inception graph finetuned on
the evaluation dataset (hanzhanggit/StackGAN-inception-model); to reproduce
its absolute numbers, convert that finetuned checkpoint and pass it via
`load_classifier`.  A self-contained `SimpleCNNClassifier` is provided for
synthetic-data pipelines and tests (the IS *math* is classifier-independent
and golden-tested).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.utils import prng


def inception_score(probs: np.ndarray, splits: int = 10
                    ) -> Tuple[float, float]:
    """IS from class posteriors p(y|x) [N, C]: exp(mean KL(p(y|x) ‖ p(y)))
    per split, mean ± std over `splits` equal chunks — the exact protocol of
    openai/improved-gan used by the reference."""
    probs = np.asarray(probs, dtype=np.float64)
    n = len(probs)
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def compute_inception_score(
    gen_fn: Callable,               # (z, emb, key) -> images[B,r,r,3]
    classifier_fn: Callable,        # images -> logits[B, C]
    embeddings: np.ndarray,         # test-caption embeddings pool [M, E]
    num_images: int = 30000,
    batch_size: int = 64,
    z_dim: int = 100,
    splits: int = 10,
    seed: int = 0,
) -> Tuple[float, float]:
    """Full pipeline: batched on-device generation + classification, IS on
    the host.  Embeddings are cycled through the test pool (reference:
    generate from test captions)."""
    key = prng.base_key(seed)
    probs = []
    n_batches = -(-num_images // batch_size)
    for b in range(n_batches):
        kb = jax.random.fold_in(key, b)
        kz, kg = jax.random.split(kb)
        idx = (np.arange(batch_size) + b * batch_size) % len(embeddings)
        emb = jnp.asarray(embeddings[idx])
        z = jax.random.normal(kz, (batch_size, z_dim))
        imgs = gen_fn(z, emb, kg)
        logits = classifier_fn(imgs)
        probs.append(np.asarray(jax.device_get(jax.nn.softmax(logits, -1))))
    probs = np.concatenate(probs)[:num_images]
    return inception_score(probs, splits)


# --- self-contained classifier (synthetic pipelines / tests) -----------------

def simple_classifier_init(key, num_classes: int, width: int = 32):
    ks = prng.split_tree(key, ("c1", "c2", "c3", "fc"))
    params = {
        "c1": L.conv2d_init(ks["c1"], 3, 3, width),
        "c2": L.conv2d_init(ks["c2"], 3, width, width * 2),
        "c3": L.conv2d_init(ks["c3"], 3, width * 2, width * 4),
        "fc": L.linear_init(ks["fc"], width * 4, num_classes),
    }
    return params


def simple_classifier_apply(params, images: jax.Array) -> jax.Array:
    """Tiny conv net: 3×[conv s2 + relu] → global mean pool → FC logits."""
    h = images
    for name in ("c1", "c2", "c3"):
        h = jax.nn.relu(L.conv2d(params[name], h, stride=2))
    h = jnp.mean(h, axis=(1, 2))
    return L.linear(params["fc"], h)


def load_classifier(path: str) -> Callable:
    """Load a converted dataset-finetuned classifier checkpoint (.npz from
    ``scripts/convert_inception.py`` for full InceptionV3 weights, or a
    `simple_classifier` param tree — auto-detected).

    The reference's finetuned TF1 inception checkpoints
    (hanzhanggit/StackGAN-inception-model) are not redistributable and this
    build environment has no network; convert them offline via torch →
    ``scripts/convert_inception.py`` and point eval here for IS numbers
    comparable to the reference's.
    """
    import os
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"classifier checkpoint {path} not found — see docstring for the "
            "conversion path")
    data = np.load(path, allow_pickle=True)
    params = jax.tree.map(jnp.asarray, data["params"].item())

    if "mixed_5b" in params:                      # full InceptionV3 tree
        from text_to_image_tpu.eval import inception_v3 as iv3
        return iv3.make_classifier(params)

    @jax.jit
    def classifier(images):
        return simple_classifier_apply(params, images)

    return classifier
