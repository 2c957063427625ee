"""End-to-end Trainer smoke: pipeline → compiled steps → metrics → samples →
checkpoint → resume (SURVEY.md §4 integration tier)."""

import glob
import os

import numpy as np
import pytest

from text_to_image_tpu.parallel.mesh import create_mesh
from text_to_image_tpu.train.trainer import Trainer
from tests.helpers import tiny_config


@pytest.fixture
def run_cfg(tmp_path):
    cfg = tiny_config("gancls")
    return cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        train=cfg.train.__class__(
            batch_size=8, max_epoch=1, summary_interval=2,
            sample_interval=4, snapshot_interval=4, g_steps=1),
    )


def test_trainer_end_to_end(run_cfg):
    env = create_mesh(data=8, model=1)
    t = Trainer(run_cfg, env=env)
    try:
        t.train(num_steps=4)
        assert int(np.asarray(t.ts.step)) == 4
        # metrics written
        logs = glob.glob(os.path.join(run_cfg.log_dir, "**", "*.jsonl"),
                         recursive=True)
        assert logs and os.path.getsize(logs[0]) > 0
        # sample grid written
        samples = glob.glob(os.path.join(run_cfg.sample_dir, "**", "*.png*"),
                            recursive=True)
        assert samples
        # checkpoint written
        assert t.ckpt.latest_step() == 4
    finally:
        t.close()

    # resume: a fresh Trainer restores step 4 and continues
    t2 = Trainer(run_cfg, env=env)
    try:
        assert int(np.asarray(t2.ts.step)) == 4
        t2.train(num_steps=6)
        assert int(np.asarray(t2.ts.step)) == 6
    finally:
        t2.close()


@pytest.mark.slow
def test_trainer_wgancls_end_to_end(tmp_path):
    """The n_critic>1 pipeline contract (stacked per-critic batches) through
    the real Trainer + GP double-backprop."""
    cfg = tiny_config("wgancls")
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"),
        train=cfg.train.__class__(
            batch_size=8, max_epoch=1, summary_interval=2,
            sample_interval=10**9, snapshot_interval=10**9,
            n_critic=2, g_steps=1, beta1=0.0),
    )
    env = create_mesh(data=8, model=1)
    t = Trainer(cfg, env=env)
    try:
        t.train(num_steps=3)
        assert int(np.asarray(t.ts.step)) == 3
        logs = glob.glob(os.path.join(cfg.log_dir, "**", "*.jsonl"),
                         recursive=True)
        assert logs
        import json
        last = json.loads(open(logs[0]).read().strip().splitlines()[-1])
        assert "gp" in last and np.isfinite(last["gp"])
    finally:
        t.close()


def test_trainer_eval_fn_hook(run_cfg):
    """eval_fn fires every eval_interval steps (never step 0), sees the
    live Trainer — the trajectory-eval hook behind best-checkpoint
    selection (scripts/chained_stackgan.py --traj)."""
    env = create_mesh(data=8, model=1)
    t = Trainer(run_cfg, env=env)
    calls = []
    try:
        t.train(num_steps=6,
                eval_fn=lambda tr, step: calls.append(
                    (step, int(np.asarray(tr.ts.step)))),
                eval_interval=2)
    finally:
        t.close()
    assert calls == [(2, 2), (4, 4), (6, 6)]
