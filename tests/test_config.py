"""Config system tests: native + reference-style YAML, overrides, errors."""

import pytest

from text_to_image_tpu.config import Config, config_from_dict, load_config


def test_defaults():
    cfg = Config()
    assert cfg.gan.z_dim == 100
    assert cfg.gan.embed_dim == 1024
    assert cfg.train.coeff.kl == 2.0
    assert cfg.train.batch_size == 64


def test_native_yaml(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("model: wgancls\ntrain:\n  n_critic: 5\n  coeff:\n    gp_lambda: 5.0\n")
    cfg = load_config(str(p))
    assert cfg.model == "wgancls"
    assert cfg.train.n_critic == 5
    assert cfg.train.coeff.gp_lambda == 5.0
    assert cfg.gan.z_dim == 100  # defaults preserved


def test_reference_style_yaml(tmp_path):
    """Reference UPPERCASE keys (StackGAN-style) map onto the same tree."""
    p = tmp_path / "ref.yml"
    p.write_text(
        "DATASET_NAME: flowers\n"
        "EMBEDDING_TYPE: cnn-rnn\n"
        "Z_DIM: 100\n"
        "GPU_ID: 0\n"
        "GAN:\n  GF_DIM: 96\n  DF_DIM: 48\n"
        "TRAIN:\n  BATCH_SIZE: 32\n  MAX_EPOCH: 120\n"
        "  COEFF:\n    KL: 2.0\n")
    cfg = load_config(str(p))
    assert cfg.data.dataset_name == "flowers"
    assert cfg.gan.gf_dim == 96
    assert cfg.gan.df_dim == 48
    assert cfg.train.batch_size == 32
    assert cfg.train.max_epoch == 120


def test_unknown_key_raises():
    with pytest.raises(ValueError, match="Unknown config keys"):
        config_from_dict({"NOT_A_KEY": 1})


def test_shipped_configs_load():
    import glob
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = glob.glob(os.path.join(root, "*.yml"))
    assert len(paths) >= 5
    for p in paths:
        cfg = load_config(p)
        from text_to_image_tpu.models.registry import MODEL_NAMES
        assert cfg.model in MODEL_NAMES


def test_shipped_wgan_configs_carry_drift_anchor():
    """The round-3 natural-photo table measured the unanchored WGAN-CLS
    recipe diverging on real pixels (critic margin 2368, r=0.746 FAIL) and
    ε_drift=1e-3 fixing it (r=0.985 PASS) — BASELINE.md.  That FAIL row must
    be unreachable from shipped configs: every WGAN-family config carries
    the score anchor, and the wired loss actually contains the term."""
    import os

    import jax.numpy as jnp

    from text_to_image_tpu.models import losses as LL

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("wgancls_flowers.yml", "pggan_flowers.yml",
                 "pggan_flowers_256.yml"):
        cfg = load_config(os.path.join(root, name))
        co = cfg.train.coeff
        assert co.drift_epsilon > 0, f"{name} ships the measured-FAIL recipe"
        s = jnp.full((4,), 3.0, jnp.float32)
        gp = jnp.float32(0.0)
        anchored = LL.wgan_cls_d_loss(s, s, s, gp, co.mismatch_alpha,
                                      co.gp_lambda, co.drift_epsilon)
        plain = LL.wgan_cls_d_loss(s, s, s, gp, co.mismatch_alpha,
                                   co.gp_lambda, 0.0)
        # anchor adds eps * (E[real^2] + E[wrong^2]) = eps * 2 * 9
        assert float(anchored["d_loss"] - plain["d_loss"]) == pytest.approx(
            co.drift_epsilon * 18.0, rel=1e-5)


def test_overrides():
    cfg = load_config.__wrapped__ if hasattr(load_config, "__wrapped__") else None
    from text_to_image_tpu.config import config_from_dict
    c = config_from_dict({"model": "gancls", "seed": 3})
    assert c.seed == 3
    c2 = c.replace(seed=9)
    assert c2.seed == 9 and c.seed == 3


def test_bool_coercion_only_for_use_pallas():
    # YAML/CLI booleans map to the tri-state dispatch knob...
    assert config_from_dict({"use_pallas": True}).use_pallas == "on"
    assert config_from_dict({"use_pallas": False}).use_pallas == "off"
    # ...but a bool for any other str field is a user error, not a path "on"
    with pytest.raises(ValueError, match="checkpoint_dir"):
        config_from_dict({"checkpoint_dir": True})


def test_mesh_slices_field_reaches_create_mesh():
    from text_to_image_tpu.parallel.mesh import create_mesh
    cfg = config_from_dict({"mesh": {"slices": 2, "data": 2, "model": 2}})
    assert cfg.mesh.slices == 2
    if len(__import__("jax").devices()) == 8:
        env = create_mesh(data=cfg.mesh.data, model=cfg.mesh.model,
                          slices=cfg.mesh.slices)
        assert env.slice_size == 2 and env.data_size == 2 and env.model_size == 2
