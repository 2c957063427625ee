"""Train-step tests: one compiled program per family, determinism, schedules
(SURVEY.md §4 integration plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from tests.helpers import make_batch, tiny_config


def _leaf_changed(a, b):
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


@pytest.mark.parametrize("model,kw", [
    ("gancls", {}),
    ("gancls", {"use_interpolation": True}),
    ("wgancls", {"n_critic": 2, "g_steps": 1, "beta1": 0.0}),
    ("stackgan_stage1", {"g_steps": 1}),
    ("stackgan_stage2", {"g_steps": 1}),
])
def test_one_step_updates_and_finite(model, kw):
    # default steps_per_epoch everywhere: tests sharing a config reuse ONE
    # compiled step via make_train_step's lru_cache (suite wall time)
    cfg = tiny_config(model, **kw)
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    batch = make_batch(cfg)

    g0 = jax.device_get(ts.g_params)
    d0 = jax.device_get(ts.d_params)
    ts2, metrics = step(ts, batch)

    assert int(ts2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert _leaf_changed(g0, ts2.g_params), "generator params unchanged"
    assert _leaf_changed(d0, ts2.d_params), "discriminator params unchanged"
    if model == "stackgan_stage2":
        # frozen stage1 untouched
        s0 = jax.tree.leaves(ts2.aux["stage1_g_params"])
        assert all(np.isfinite(np.asarray(x)).all() for x in s0)


def test_wgan_metrics_include_gp_and_wdist():
    cfg = tiny_config("wgancls", n_critic=2, g_steps=1, beta1=0.0)
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    _, metrics = step(ts, make_batch(cfg))
    assert "gp" in metrics and "w_dist" in metrics
    assert float(metrics["gp"]) >= 0


def test_kl_metric_for_ca_models():
    cfg = tiny_config("stackgan_stage1", g_steps=1)
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    _, metrics = step(ts, make_batch(cfg))
    assert "kl" in metrics and float(metrics["kl"]) >= 0


def test_interp_term_present_only_when_enabled():
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    _, m0 = make_train_step(cfg)(ts, make_batch(cfg))
    assert "g_interp" not in m0

    cfg2 = tiny_config("gancls", use_interpolation=True)
    ts2 = init_train_state(prng.base_key(0), cfg2)
    _, m1 = make_train_step(cfg2)(ts2, make_batch(cfg2))
    assert "g_interp" in m1


def test_determinism_across_reruns():
    """Same seed + same data ⇒ identical metrics and params (PRNG discipline
    via fold_in(base, step))."""
    def run():
        cfg = tiny_config("gancls")
        ts = init_train_state(prng.base_key(0), cfg)
        step = make_train_step(cfg)
        for i in range(2):
            ts, m = step(ts, make_batch(cfg, seed=i))
        return jax.device_get((ts.g_params, m))

    (p1, m1), (p2, m2) = run(), run()
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)
    assert m1.keys() == m2.keys()
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])


def test_uint8_batch_matches_float_batch():
    """The step accepts uint8 images (device-side normalization) and must
    produce the same result as the float path."""
    cfg = tiny_config("gancls")
    fb = make_batch(cfg)
    ub = {**fb, "real": ((fb["real"] + 1) * 127.5).astype(np.uint8),
          "wrong": ((fb["wrong"] + 1) * 127.5).astype(np.uint8)}
    # re-derive floats from the quantized uint8 so both paths see identical pixels
    fb = {**ub, "real": ub["real"].astype(np.float32) / 127.5 - 1.0,
          "wrong": ub["wrong"].astype(np.float32) / 127.5 - 1.0}

    step = make_train_step(cfg)
    _, m_f = step(init_train_state(prng.base_key(0), cfg), fb)
    _, m_u = step(init_train_state(prng.base_key(0), cfg), ub)
    for k in m_f:
        np.testing.assert_allclose(float(m_f[k]), float(m_u[k]), rtol=1e-5,
                                   err_msg=f"metric {k}")


@pytest.mark.slow
def test_stage2_remat_matches_no_remat():
    """jax.checkpoint on the Stage-II generator must not change the math."""
    cfg = tiny_config("stackgan_stage2", g_steps=1)
    batch = make_batch(cfg)
    _, m0 = make_train_step(cfg)(init_train_state(prng.base_key(0), cfg), batch)
    cfg_r = cfg.replace(remat=True)
    _, m1 = make_train_step(cfg_r)(init_train_state(prng.base_key(0), cfg_r),
                                   batch)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=f"metric {k} changed under remat")


def test_multi_step_progression():
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    for i in range(3):
        ts, metrics = step(ts, make_batch(cfg, seed=i))
    assert int(ts.step) == 3
    assert np.isfinite(float(metrics["g_loss"]))


def test_compute_key_shares_compiled_steps():
    """Configs differing only in paths/logging knobs reuse ONE cached step;
    anything compile-relevant (seed, lr, use_pallas, model dims) does not."""
    base = tiny_config("gancls")
    a = base.replace(checkpoint_dir="/tmp/a", log_dir="/tmp/la")
    b = base.replace(checkpoint_dir="/tmp/b", sample_dir="/tmp/sb")
    assert make_train_step(a) is make_train_step(b)
    assert make_train_step(a) is not make_train_step(base.replace(seed=7))
    assert make_train_step(a) is not make_train_step(
        base.replace(use_pallas="on"))


def test_ema_tracks_generator_and_serves_eval():
    """train.ema_decay > 0 maintains aux['ema_g_params'] as an exact lerp of
    the live generator params (Karras eval-EMA recipe) and eval_g_params
    routes samplers/evaluators to it; decay 0 keeps the state EMA-free."""
    from text_to_image_tpu.eval.sampler import eval_g_params

    decay = 0.5  # large 1-decay so the lerp is visible in 2 steps
    cfg = tiny_config("gancls", ema_decay=decay)
    ts = init_train_state(prng.base_key(0), cfg)
    assert "ema_g_params" in ts.aux
    # at init the EMA IS the init params
    for e, p in zip(jax.tree.leaves(ts.aux["ema_g_params"]),
                    jax.tree.leaves(ts.g_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step = make_train_step(cfg)
    ema = jax.device_get(ts.aux["ema_g_params"])
    for i in range(2):
        ts, _ = step(ts, make_batch(cfg, seed=i))
        live = jax.device_get(ts.g_params)
        ema = jax.tree.map(lambda e, p: e + (1 - decay) * (p - e), ema, live)
        got = jax.device_get(ts.aux["ema_g_params"])
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(got)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    # EMA must lag the live params (it is the eval average, not a copy) ...
    assert _leaf_changed(ts.aux["ema_g_params"], ts.g_params)
    # ... and eval_g_params serves it
    assert eval_g_params(ts) is ts.aux["ema_g_params"]

    # decay 0 (default) → no EMA state, eval uses live params
    cfg0 = tiny_config("gancls")
    ts0 = init_train_state(prng.base_key(0), cfg0)
    assert "ema_g_params" not in ts0.aux
    assert eval_g_params(ts0) is ts0.g_params


def test_ema_coexists_with_stage2_aux():
    """Stage-II carries the frozen Stage-I generator in aux; ema_decay > 0
    must ADD ema_g_params alongside it, not replace the dict (regression:
    init overwrote aux, so the first Stage-II EMA step raised KeyError)."""
    cfg = tiny_config("stackgan_stage2", g_steps=1, ema_decay=0.999)
    ts = init_train_state(prng.base_key(0), cfg)
    assert "ema_g_params" in ts.aux and "stage1_g_params" in ts.aux
    step = make_train_step(cfg)
    ts, metrics = step(ts, make_batch(cfg))
    assert np.isfinite(float(metrics["g_loss"]))
    assert "ema_g_params" in ts.aux


def test_ema_rampup_follows_the_ramped_decay():
    """ema_rampup > 0: effective decay is min(ema_decay, (1+t)/(rampup+t))
    with t = the step counter at update time — early steps track the live
    params closely (short horizon), the cap is approached later."""
    decay, ramp = 0.999, 10.0
    cfg = tiny_config("gancls", ema_decay=decay, ema_rampup=ramp)
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    ema = jax.device_get(ts.aux["ema_g_params"])
    for t in range(3):
        ts, _ = step(ts, make_batch(cfg, seed=t))
        live = jax.device_get(ts.g_params)
        d_t = min(decay, (1.0 + t) / (ramp + t))
        ema = jax.tree.map(lambda e, p: e + (1 - d_t) * (p - e), ema, live)
        got = jax.device_get(ts.aux["ema_g_params"])
        for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(got)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_pggan_ema_anchor_is_fade_end():
    """The PGGAN bundle anchors the fade-aware EMA ramp at the current
    stage's fade end (stage 1 has no fade: anchor 0)."""
    import dataclasses
    from text_to_image_tpu.models.registry import get_model
    cfg = tiny_config("pggan", image_size=16)
    cfg = cfg.replace(pggan=dataclasses.replace(
        cfg.pggan, stage=3, steps_per_stage=100, fade_fraction=0.5,
        start_step=200))
    assert get_model(cfg).ema_anchor == 250  # start 200 + fade 50
    cfg1 = cfg.replace(pggan=dataclasses.replace(cfg.pggan, stage=1,
                                                 start_step=0))
    assert get_model(cfg1).ema_anchor == 0
