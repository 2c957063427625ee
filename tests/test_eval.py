"""Eval tests: IS math golden values (stubbed classifier → exact score),
sampler grid shapes (SURVEY.md §4 eval plan)."""

import jax
import numpy as np

from text_to_image_tpu.eval import inception as E
from text_to_image_tpu.eval.sampler import (latent_interpolation_grid,
                                            make_generator_fn, sample_grid,
                                            text_interpolation_grid)
from text_to_image_tpu.train.steps import init_train_state
from text_to_image_tpu.utils import prng
from text_to_image_tpu.utils.images import merge, inverse_transform
from tests.helpers import tiny_config


def test_inception_score_uniform_is_one():
    """p(y|x) uniform for every x → KL = 0 → IS = 1 exactly."""
    probs = np.full((100, 10), 0.1)
    mean, std = E.inception_score(probs, splits=10)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-8)
    np.testing.assert_allclose(std, 0.0, atol=1e-8)


def test_inception_score_onehot_is_nclasses():
    """Perfectly confident + perfectly diverse → IS = #classes (upper bound)."""
    n, c = 100, 4
    probs = np.eye(c)[np.arange(n) % c]
    # splits=5 → 20 items per split, evenly covering the 4 classes
    mean, _ = E.inception_score(probs, splits=5)
    np.testing.assert_allclose(mean, c, rtol=1e-6)


def test_inception_score_known_intermediate():
    """Two classes, half the mass each, confidence 0.9 → analytic value."""
    p = np.array([[0.9, 0.1], [0.1, 0.9]])
    probs = np.tile(p, (50, 1))
    py = np.array([0.5, 0.5])
    kl = (p * (np.log(p) - np.log(py))).sum(1).mean()
    mean, _ = E.inception_score(probs, splits=1)
    np.testing.assert_allclose(mean, np.exp(kl), rtol=1e-6)


def test_compute_inception_score_pipeline():
    """End-to-end with a stub generator and stub classifier: images encode
    their class, classifier decodes it → IS == num_classes."""
    n_classes = 4

    def gen_fn(z, emb, key):
        # encode "class" = first embedding coordinate bucket into the image
        cls = (jnp_abs_bucket(emb, n_classes))
        return cls

    import jax.numpy as jnp

    def jnp_abs_bucket(emb, n):
        idx = jnp.arange(emb.shape[0]) % n
        return jnp.broadcast_to(idx[:, None, None, None].astype(jnp.float32),
                                (emb.shape[0], 8, 8, 3))

    def classifier_fn(imgs):
        import jax.numpy as jnp
        cls = jnp.round(imgs[:, 0, 0, 0]).astype(jnp.int32)
        return jax.nn.one_hot(cls, n_classes) * 100.0

    emb = np.random.default_rng(0).normal(size=(32, 8)).astype(np.float32)
    mean, std = E.compute_inception_score(
        gen_fn, classifier_fn, emb, num_images=64, batch_size=16, z_dim=4,
        splits=4)
    np.testing.assert_allclose(mean, n_classes, rtol=1e-5)


def test_simple_classifier_shapes():
    key = jax.random.PRNGKey(0)
    params = E.simple_classifier_init(key, num_classes=5, width=8)
    imgs = jax.random.uniform(key, (4, 16, 16, 3), minval=-1, maxval=1)
    logits = E.simple_classifier_apply(params, imgs)
    assert logits.shape == (4, 5)


def test_samplers_shapes():
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    gen = make_generator_fn(cfg)
    key = jax.random.PRNGKey(0)
    emb = np.random.default_rng(0).normal(
        size=(8, cfg.gan.embed_dim)).astype(np.float32)

    r = cfg.data.image_size
    grid = sample_grid(gen, ts, cfg, emb, key)
    assert grid.shape == (8, r, r, 3)

    imgs, g = latent_interpolation_grid(gen, ts, cfg, emb[:2], 4, key)
    assert imgs.shape == (8, r, r, 3) and g == (2, 4)
    # endpoints of a row share the caption but differ in z
    assert not np.allclose(imgs[0], imgs[3])

    imgs, g = text_interpolation_grid(gen, ts, cfg, emb[:2], emb[2:4], 4, key)
    assert imgs.shape == (8, r, r, 3) and g == (2, 4)


def test_merge_and_inverse_transform():
    imgs = np.zeros((6, 4, 4, 3), np.float32)
    tile = merge(inverse_transform(imgs), (2, 3))
    assert tile.shape == (8, 12, 3)
    assert tile.dtype == np.uint8
    np.testing.assert_array_equal(tile, np.full_like(tile, 127))
