"""C-PGGAN tests: stage shapes, fade-in schedule, equalized-LR/pixelnorm
math, one compiled train step per stage, and the checkpoint-linked
progression (models/pggan.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.models import pggan as PG
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from tests.helpers import make_batch, tiny_config

KEY = jax.random.PRNGKey(11)


def pg_config(stage: int = 0, image_size: int = 16, **train_kw):
    cfg = tiny_config("pggan", image_size=image_size, n_critic=1, g_steps=1,
                      beta1=0.0, **train_kw)
    return cfg.replace(pggan=dataclasses.replace(
        cfg.pggan, stage=stage, steps_per_stage=4, fade_fraction=0.5))


def test_stage_math():
    assert [PG.stage_resolution(s) for s in (1, 2, 3, 5)] == [4, 8, 16, 64]
    assert PG.num_stages(64) == 5 and PG.num_stages(16) == 3
    with pytest.raises(ValueError):
        PG.num_stages(48)


def test_pixel_norm_unit_rms():
    x = jax.random.normal(KEY, (4, 8, 8, 32)) * 3.0 + 1.0
    y = PG.pixel_norm(x)
    rms = np.sqrt(np.mean(np.asarray(y) ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-3)


def test_minibatch_stddev_appends_constant_channel():
    x = jax.random.normal(KEY, (6, 4, 4, 8))
    y = PG.minibatch_stddev(x)
    assert y.shape == (6, 4, 4, 9)
    feat = np.asarray(y[..., -1])
    assert np.allclose(feat, feat.flat[0])  # constant across batch+space
    assert feat.flat[0] > 0


def test_downsample_to_exact_avgpool():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    y = PG.downsample_to(x, 4)
    assert y.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0, 0]),
        np.asarray(x[0, :2, :2, 0]).mean(), rtol=1e-6)


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_generator_shapes_per_stage(stage):
    cfg = pg_config(stage=stage)
    gp, _ = PG.generator_init(KEY, cfg.gan, cfg.data.image_size)
    z = jax.random.normal(KEY, (4, cfg.gan.z_dim))
    emb = jax.random.normal(KEY, (4, cfg.gan.embed_dim))
    img, ca = PG.generator_apply(gp, z, emb, KEY, stage, 0.5, cfg.gan)
    r = PG.stage_resolution(stage)
    assert img.shape == (4, r, r, 3)
    assert np.all(np.abs(np.asarray(img)) <= 1.0)
    assert ca["mu"].shape == (4, cfg.gan.ca_dim)

    dp, _ = PG.discriminator_init(KEY, cfg.gan, cfg.data.image_size)
    score = PG.discriminator_apply(dp, img, emb, stage, 0.5, cfg.gan)
    assert score.shape == (4,)
    assert np.isfinite(np.asarray(score)).all()


def test_alpha_schedule():
    cfg = pg_config(stage=2)  # start_step auto = 4, fade = 2
    bundle = get_model(cfg)
    alphas = [float(bundle.step_aux(jnp.int32(s))["alpha"])
              for s in (3, 4, 5, 6, 8)]
    assert alphas == [0.0, 0.0, 0.5, 1.0, 1.0]
    # first stage and fade=0 are always fully blended
    assert float(get_model(pg_config(stage=1)).step_aux(
        jnp.int32(0))["alpha"]) == 1.0


def test_fade_blends_previous_stage_rgb():
    """At α=0 the stage-s generator must equal the upsampled stage-(s-1)
    output (the fade-in contract)."""
    cfg = pg_config(stage=2)
    gp, _ = PG.generator_init(KEY, cfg.gan, cfg.data.image_size)
    z = jax.random.normal(KEY, (2, cfg.gan.z_dim))
    emb = jax.random.normal(KEY, (2, cfg.gan.embed_dim))
    img2, _ = PG.generator_apply(gp, z, emb, KEY, 2, 0.0, cfg.gan)
    img1, _ = PG.generator_apply(gp, z, emb, KEY, 1, 1.0, cfg.gan)
    # α=0 blends pre-tanh RGB, and tanh commutes with nearest-neighbor
    # upsampling, so stage-2@α=0 must equal upsample(stage-1) exactly
    np.testing.assert_allclose(
        np.asarray(img2),
        np.asarray(L.upsample_nearest(jnp.asarray(img1))), atol=1e-5)


def test_one_step_updates_and_finite_pggan():
    for stage in (1, 2):
        cfg = pg_config(stage=stage)
        ts = init_train_state(prng.base_key(0), cfg)
        step = make_train_step(cfg)
        g0 = jax.device_get(ts.g_params)
        ts2, metrics = step(ts, make_batch(cfg))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"stage {stage} {k} not finite"
        assert "gp" in metrics and "kl" in metrics
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(g0),
                            jax.tree.leaves(ts2.g_params)))
        assert changed, f"stage {stage}: generator params unchanged"


@pytest.mark.slow
def test_progression_carries_checkpoints(tmp_path):
    """train_progressive links stages via checkpoint restore: after the run
    the final checkpoint step equals n_stages · steps_per_stage."""
    from text_to_image_tpu.train import checkpoint as C
    from text_to_image_tpu.train.trainer import train_progressive

    cfg = pg_config(stage=0, image_size=8)  # 2 stages: 4px, 8px
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        train=dataclasses.replace(cfg.train, snapshot_interval=10**9,
                                  sample_interval=10**9))
    train_progressive(cfg, total_steps=4)  # 2 steps per stage
    import os
    run_dir = os.path.join(cfg.checkpoint_dir, "pggan", "synthetic")
    mgr = C.CheckpointManager(run_dir)
    ts = init_train_state(prng.base_key(cfg.seed), cfg)
    restored, step = mgr.restore(ts)
    assert step == 4
    mgr.close()


@pytest.mark.slow
def test_progression_resume_skips_covered_stages(tmp_path, monkeypatch):
    """An interrupted progression resumes at the first uncovered stage:
    re-running train_progressive over an existing run dir must not rebuild
    Trainers for stages the latest checkpoint already covers (each no-op
    Trainer costs a full init over a tunneled TPU)."""
    import os
    from text_to_image_tpu.train import trainer as T

    cfg = pg_config(stage=0, image_size=8)  # 2 stages: 4px, 8px
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        train=dataclasses.replace(cfg.train, snapshot_interval=10**9,
                                  sample_interval=10**9))
    T.train_progressive(cfg, total_steps=4)  # full 2-stage run

    built = []
    real = T.Trainer

    class CountingTrainer(real):
        def __init__(self, sub, *a, **k):
            built.append(sub.pggan.stage)
            super().__init__(sub, *a, **k)

    monkeypatch.setattr(T, "Trainer", CountingTrainer)
    T.train_progressive(cfg, total_steps=4)  # resume over the finished run
    assert built == [2], f"expected only the final stage, rebuilt {built}"
