"""CPU integration: short training runs must produce the qualitative GAN
signals (SURVEY.md §4 'overfit test' tier) — D separates real from fake, and
the matching-aware margin appears."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from text_to_image_tpu.data.synthetic import SyntheticDataset
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from tests.helpers import tiny_config


@pytest.mark.slow
def test_short_training_separates_real_from_fake():
    cfg = tiny_config("gancls", g_steps=1)
    ds = SyntheticDataset(num_examples=32, image_size=cfg.data.image_size,
                          embed_dim=cfg.gan.embed_dim, num_classes=4, seed=0)
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    batches = [
        {k: v[None] for k, v in ds.next_batch(cfg.train.batch_size).items()}
        for _ in range(4)]
    for i in range(120):
        ts, m = step(ts, batches[i % 4])
    assert np.isfinite(float(m["d_loss"]))

    bundle = get_model(cfg)
    b = ds.next_batch(16)
    real = jnp.asarray(b["real"].astype(np.float32) / 127.5 - 1.0)
    emb = jnp.asarray(b["emb"])
    z = jax.random.normal(jax.random.PRNGKey(3), (16, cfg.gan.z_dim))
    fake, _, _ = bundle.gen_apply(ts.g_params, ts.g_state, ts.aux, z, emb,
                                  jax.random.PRNGKey(4), True, L.FP32)
    d_real, _ = bundle.disc_apply(ts.d_params, ts.d_state, ts.aux, real,
                                  emb, True, L.FP32)
    d_fake, _ = bundle.disc_apply(ts.d_params, ts.d_state, ts.aux, fake,
                                  emb, True, L.FP32)
    # after 120 steps on 4 fixed batches D must score real above fake
    assert float(jnp.mean(d_real)) > float(jnp.mean(d_fake)) + 0.3, (
        float(jnp.mean(d_real)), float(jnp.mean(d_fake)))
