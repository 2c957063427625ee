"""Dataset-finetuned eval classifier: learns synthetic classes, and the IS
computed with it separates trained-looking from degenerate generators."""

import numpy as np

from text_to_image_tpu.data.synthetic import SyntheticDataset
from text_to_image_tpu.eval.classifier import make_classifier_fn, train_classifier
from text_to_image_tpu.eval.inception import compute_inception_score


def test_classifier_learns_synthetic_classes():
    ds = SyntheticDataset(num_examples=128, image_size=16, embed_dim=8,
                          num_classes=4, seed=0)
    params, acc = train_classifier(ds.images, ds.class_ids, 4, steps=400,
                                   batch_size=32, width=16)
    assert acc > 0.9, f"classifier failed to fit synthetic classes: {acc}"

    clf = make_classifier_fn(params)
    # degenerate generator (constant gray) → IS ≈ 1
    def gray_gen(z, emb, key):
        import jax.numpy as jnp
        return jnp.zeros((z.shape[0], 16, 16, 3))

    mean, _ = compute_inception_score(gray_gen, clf,
                                      ds.test_embeddings().astype(np.float32),
                                      num_images=64, batch_size=32, z_dim=4,
                                      splits=2)
    assert mean < 1.5

    # oracle "generator" that replays real class images → IS near num_classes
    rng = np.random.default_rng(0)

    def oracle_gen(z, emb, key):
        idx = rng.integers(0, ds.num_examples, z.shape[0])
        return ds.images[idx].astype(np.float32) / 127.5 - 1.0

    mean2, _ = compute_inception_score(oracle_gen, clf,
                                       ds.test_embeddings().astype(np.float32),
                                       num_images=64, batch_size=32, z_dim=4,
                                       splits=2)
    assert mean2 > 2.5, f"IS on real-image oracle too low: {mean2}"
