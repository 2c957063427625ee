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


def test_traj_hook_persists_best_json_for_resume(tmp_path, monkeypatch):
    """The --traj best-checkpoint hook writes best.json beside the best
    checkpoint on every new IS peak (and ONLY on a peak), so a --resume'd
    run seeds its best record instead of clobbering the true peak's
    checkpoint with its first (worse) eval."""
    import importlib.util
    import json as _json
    import types

    spec = importlib.util.spec_from_file_location(
        "chained_stackgan",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "chained_stackgan.py"))
    cs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cs)

    from text_to_image_tpu.eval import synthetic_quality as sq
    from text_to_image_tpu.train.checkpoint import CheckpointManager

    seq = iter([{"is_mean": 5.0, "cond_acc": 0.5},
                {"is_mean": 4.0, "cond_acc": 0.9},   # worse: no overwrite
                {"is_mean": 6.0, "cond_acc": 0.7}])
    monkeypatch.setattr(sq, "evaluate", lambda *a, **kw: dict(next(seq)))

    cfg = tiny_config("gancls")
    ds = types.SimpleNamespace(num_classes=4)
    mgr = CheckpointManager(str(tmp_path / "best"), max_to_keep=1)
    points, state = [], {"ckpt": mgr}
    hook = cs._traj_hook(cfg, ds, points, state)

    saved = []
    trainer = types.SimpleNamespace(
        ts={"w": np.zeros(2, np.float32)},
        save_samples=lambda step: saved.append(step))
    best_json = os.path.join(mgr.directory, "best.json")

    hook(trainer, 1)
    assert _json.load(open(best_json))["step"] == 1
    hook(trainer, 2)  # worse IS: best.json untouched
    assert _json.load(open(best_json))["step"] == 1
    hook(trainer, 3)
    rec = _json.load(open(best_json))
    assert rec["step"] == 3 and rec["is_mean"] == 6.0
    assert saved == [1, 3] and len(points) == 3
    # the --resume seed path reads this file back as the starting best
    assert rec == state["best"]
    mgr.close()
