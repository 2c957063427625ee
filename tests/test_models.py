"""Model-family tests: shapes, stream-vmap equivalence, CA behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.models import gancls, stackgan
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L
from tests.helpers import tiny_config

KEY = jax.random.PRNGKey(1)


@pytest.mark.parametrize("model", ["gancls", "wgancls", "stackgan_stage1",
                                   "stackgan_stage2"])
def test_bundle_shapes(model):
    cfg = tiny_config(model)
    bundle = get_model(cfg)
    gp, gs, dp, ds = bundle.init(KEY)

    aux = {}
    if bundle.needs_stage1:
        s1p, s1s = stackgan.stage1_generator_init(
            KEY, cfg.gan, cfg.data.image_size // 4)
        aux = {"stage1_g_params": s1p, "stage1_g_state": s1s}

    b = 4
    z = jax.random.normal(KEY, (b, cfg.gan.z_dim))
    emb = jax.random.normal(KEY, (b, cfg.gan.embed_dim))
    img, new_gs, gen_aux = bundle.gen_apply(gp, gs, aux, z, emb, KEY, True,
                                            L.FP32)
    r = bundle.resolution
    assert img.shape == (b, r, r, 3)
    assert np.all(np.abs(np.asarray(img)) <= 1.0)  # tanh range
    if bundle.has_ca:
        assert gen_aux["mu"].shape == (b, cfg.gan.ca_dim)

    logit, new_ds = bundle.disc_apply(dp, ds, {}, img, emb, True, L.FP32)
    assert logit.shape == (b,)


def test_disc_streams_matches_separate_calls():
    """vmapped 3-stream D must equal three independent D calls — including
    per-stream BatchNorm statistics (reference semantics, SURVEY §3.1)."""
    cfg = tiny_config("gancls")
    dp, ds = gancls.discriminator_init(KEY, cfg.gan, cfg.data.image_size,
                                       norm="batch")
    b, r = 4, cfg.data.image_size
    k1, k2 = jax.random.split(KEY)
    xs = jax.random.normal(k1, (3, b, r, r, 3))
    embs = jax.random.normal(k2, (3, b, cfg.gan.embed_dim))

    stream_logits, _ = gancls.discriminator_apply_streams(
        dp, ds, xs, embs, True, L.FP32, cfg.data.image_size, "batch")
    for s in range(3):
        solo, _ = gancls.discriminator_apply(
            dp, ds, xs[s], embs[s], True, L.FP32, cfg.data.image_size, "batch")
        np.testing.assert_allclose(stream_logits[s], solo, rtol=2e-4, atol=2e-5)


def test_generator_deterministic_given_inputs():
    cfg = tiny_config("gancls")
    gp, gs = gancls.generator_init(KEY, cfg.gan, cfg.data.image_size)
    z = jax.random.normal(KEY, (2, cfg.gan.z_dim))
    emb = jax.random.normal(KEY, (2, cfg.gan.embed_dim))
    a, _ = gancls.generator_apply(gp, gs, z, emb, True, L.FP32,
                                  cfg.data.image_size)
    b, _ = gancls.generator_apply(gp, gs, z, emb, True, L.FP32,
                                  cfg.data.image_size)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ca_reparameterization():
    p = stackgan.ca_init(KEY, 32, 16)
    emb = jax.random.normal(KEY, (4, 32))
    c1, mu, logvar = stackgan.ca_apply(p, emb, jax.random.PRNGKey(1))
    c2, _, _ = stackgan.ca_apply(p, emb, jax.random.PRNGKey(2))
    assert c1.shape == (4, 16) and mu.shape == (4, 16)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))  # stochastic in key
    # deterministic given the key
    c3, _, _ = stackgan.ca_apply(p, emb, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c3))


def test_stage2_output_is_4x_input():
    cfg = tiny_config("stackgan_stage2")  # image_size 64 → stage1 at 16
    gp, gs = stackgan.stage2_generator_init(KEY, cfg.gan, lr_resolution=16)
    lr = jax.random.uniform(KEY, (2, 16, 16, 3), minval=-1, maxval=1)
    emb = jax.random.normal(KEY, (2, cfg.gan.embed_dim))
    hr, _, aux = stackgan.stage2_generator_apply(gp, gs, lr, emb, KEY, True,
                                                 L.FP32)
    assert hr.shape == (2, 64, 64, 3)
    assert aux["mu"].shape == (2, cfg.gan.ca_dim)


def test_wgan_critic_has_no_batch_state():
    cfg = tiny_config("wgancls")
    dp, ds = gancls.discriminator_init(KEY, cfg.gan, cfg.data.image_size,
                                       norm="layer")
    assert ds == {}  # layer norm is stateless — GP-safe
