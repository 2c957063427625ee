"""Checkpoint tests: save→restore bit-identical resume + the Stage-I→Stage-II
cross-model restore (SURVEY.md §5.4 — the one nontrivial checkpoint
behavior)."""

import os

import jax
import numpy as np

from text_to_image_tpu.train import checkpoint as C
from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from tests.helpers import make_batch, tiny_config


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_bit_identical(tmp_path):
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    step = make_train_step(cfg)
    ts, _ = step(ts, make_batch(cfg))

    mgr = C.CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, jax.device_get(ts))

    ts_fresh = init_train_state(prng.base_key(0), cfg)
    restored, rstep = mgr.restore(ts_fresh)
    assert rstep == 1
    _trees_equal(ts.g_params, restored.g_params)
    _trees_equal(ts.d_params, restored.d_params)
    _trees_equal(ts.g_opt, restored.g_opt)
    mgr.close()


def test_resume_continues_identically(tmp_path):
    """train 2 steps straight == train 1, checkpoint, restore, train 1."""
    cfg = tiny_config("gancls")
    step = make_train_step(cfg)

    ts_a = init_train_state(prng.base_key(0), cfg)
    ts_a, _ = step(ts_a, make_batch(cfg, seed=0))
    ts_a, _ = step(ts_a, make_batch(cfg, seed=1))

    ts_b = init_train_state(prng.base_key(0), cfg)
    ts_b, _ = step(ts_b, make_batch(cfg, seed=0))
    mgr = C.CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, jax.device_get(ts_b))
    ts_b2, _ = mgr.restore(init_train_state(prng.base_key(0), cfg))
    ts_b2, _ = step(ts_b2, make_batch(cfg, seed=1))

    _trees_equal(jax.device_get(ts_a.g_params), jax.device_get(ts_b2.g_params))
    _trees_equal(jax.device_get(ts_a.d_params), jax.device_get(ts_b2.d_params))
    mgr.close()


def test_async_save_then_restore(tmp_path):
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    mgr = C.CheckpointManager(str(tmp_path / "acs"), async_save=True)
    mgr.save(3, jax.device_get(ts))
    restored, step = mgr.restore(init_train_state(prng.base_key(0), cfg))
    assert step == 3
    _trees_equal(ts.g_params, restored.g_params)
    mgr.close()


def test_latest_step_none_when_empty(tmp_path):
    mgr = C.CheckpointManager(str(tmp_path / "empty"))
    cfg = tiny_config("gancls")
    ts = init_train_state(prng.base_key(0), cfg)
    same, step = mgr.restore(ts)
    assert step is None and same is ts
    mgr.close()


def test_stage1_cross_restore(tmp_path):
    """Stage-II init loads the trained Stage-I generator from its checkpoint."""
    # stage1 must match stage2's draft resolution (stage2 size // 4)
    cfg1 = tiny_config("stackgan_stage1", image_size=8, g_steps=1)
    ts1 = init_train_state(prng.base_key(0), cfg1)
    ts1, _ = make_train_step(cfg1)(ts1, make_batch(cfg1))
    mgr = C.CheckpointManager(str(tmp_path / "s1"))
    mgr.save(1, jax.device_get(ts1))
    mgr.close()

    s1_params, s1_state = C.load_stage1_generator(
        str(tmp_path / "s1"), init_train_state(prng.base_key(0), cfg1))
    _trees_equal(jax.device_get(ts1.g_params), s1_params)

    cfg2 = tiny_config("stackgan_stage2", g_steps=1)
    ts2 = init_train_state(prng.base_key(1), cfg2, stage1=(s1_params, s1_state))
    _trees_equal(ts2.aux["stage1_g_params"], s1_params)
    # and the stage-2 step runs with the restored stage-1 inside
    _, metrics = make_train_step(cfg2)(ts2, make_batch(cfg2))
    assert np.isfinite(float(metrics["g_loss"]))


def test_stage1_cross_restore_prefers_ema_params(tmp_path):
    """When Stage-I trained with a generator EMA, the cross-model restore
    freezes the EMA (eval) weights into Stage-II, not the live params."""
    cfg1 = tiny_config("stackgan_stage1", image_size=8, g_steps=1,
                       ema_decay=0.5)
    ts1 = init_train_state(prng.base_key(0), cfg1)
    step = make_train_step(cfg1)
    for s in range(2):  # live params drift away from the EMA average
        ts1, _ = step(ts1, make_batch(cfg1, seed=s))
    ema = jax.device_get(ts1.aux["ema_g_params"])
    live = jax.device_get(ts1.g_params)
    assert any(np.any(a != b) for a, b in zip(jax.tree.leaves(ema),
                                              jax.tree.leaves(live)))
    mgr = C.CheckpointManager(str(tmp_path / "s1e"))
    mgr.save(2, jax.device_get(ts1))
    mgr.close()

    s1_params, _ = C.load_stage1_generator(
        str(tmp_path / "s1e"), init_train_state(prng.base_key(0), cfg1))
    _trees_equal(ema, jax.device_get(s1_params))


def test_restore_reconciles_toggled_ema(tmp_path):
    """Toggling train.ema_decay between runs changes the aux pytree; restore
    must reconcile instead of failing (ADVICE r4): a pre-EMA checkpoint
    restored into an EMA run backfills ema_g_params from g_params, and an
    EMA checkpoint restored into a non-EMA run drops the averaged copy."""
    cfg_plain = tiny_config("gancls")
    cfg_ema = tiny_config("gancls", ema_decay=0.9)

    # pre-EMA checkpoint -> EMA-enabled run
    ts = init_train_state(prng.base_key(0), cfg_plain)
    mgr = C.CheckpointManager(str(tmp_path / "a"))
    mgr.save(1, jax.device_get(ts))
    restored, step = mgr.restore(init_train_state(prng.base_key(1), cfg_ema))
    mgr.close()
    assert step == 1
    _trees_equal(ts.g_params, restored.g_params)
    _trees_equal(restored.g_params, restored.aux["ema_g_params"])
    # the reconciled state steps fine under the EMA schedule
    ts2, m = make_train_step(cfg_ema)(restored, make_batch(cfg_ema))
    assert np.isfinite(float(m["g_loss"]))
    assert "ema_g_params" in ts2.aux

    # EMA checkpoint -> non-EMA run
    ts_e = init_train_state(prng.base_key(0), cfg_ema)
    mgr = C.CheckpointManager(str(tmp_path / "b"))
    mgr.save(2, jax.device_get(ts_e))
    restored2, step2 = mgr.restore(
        init_train_state(prng.base_key(1), cfg_plain))
    mgr.close()
    assert step2 == 2
    assert "ema_g_params" not in restored2.aux
    _trees_equal(ts_e.g_params, restored2.g_params)

    # genuinely mismatched structures still raise the informative error
    cfg_other = tiny_config("gancls", image_size=32)
    mgr = C.CheckpointManager(str(tmp_path / "a"))
    try:
        mgr.restore(init_train_state(prng.base_key(0), cfg_other))
        raised = False
    except ValueError as e:
        raised = True
        assert "ema_decay" in str(e)
    finally:
        mgr.close()
    assert raised
