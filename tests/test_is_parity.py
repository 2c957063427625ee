"""Inception-score absolute-parity chain (SURVEY.md §3.5).

The reference evaluates with a dataset-finetuned Inception network; absolute
IS parity needs that checkpoint flowing through our converter into the CLI's
``--eval-is`` path.  The real finetuned weights aren't redistributable (and
this environment is offline), so these tests drive the FULL chain with a
synthetically-written torchvision-layout checkpoint: only the weight values
differ from the real parity run.

    torch.save(torchvision-layout state dict)
      → scripts/convert_inception.py            (the real script, real argv)
      → eval.inception.load_classifier          (auto-detects the iv3 tree)
      → logits match the source forward
      → main.evaluate(--eval-is) autodetects <data_dir>/inception.npz
"""

import os
import runpy
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from text_to_image_tpu.eval import inception_v3 as iv3


def _torchvision_state_dict(params):
    """Exercise the shared exporter (eval/inception_v3.py) — the runbook uses
    the same function to fabricate its stand-in checkpoint."""
    return iv3.export_torchvision_state_dict(params)


@pytest.fixture(scope="module")
def converted_npz(tmp_path_factory):
    """Write a real-layout .pth and run the actual converter script on it."""
    torch = pytest.importorskip("torch")
    tmp = tmp_path_factory.mktemp("isparity")
    params = iv3.init(jax.random.PRNGKey(0), num_classes=5)
    pth = tmp / "finetuned_inception.pth"
    # nested checkpoint dict — the common finetune-script save format
    torch.save({"state_dict": _torchvision_state_dict(params)}, str(pth))

    out = tmp / "inception.npz"
    argv = sys.argv
    sys.argv = ["convert_inception.py", "--pth", str(pth), "--out", str(out)]
    try:
        runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "convert_inception.py"),
            run_name="__main__")
    finally:
        sys.argv = argv
    return params, str(out)


@pytest.mark.slow
def test_convert_load_classify(converted_npz):
    """Converted checkpoint loads and its logits match the source params."""
    params, npz = converted_npz
    from text_to_image_tpu.eval.inception import load_classifier
    classifier = load_classifier(npz)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    got = np.asarray(classifier(imgs))
    want = np.asarray(iv3.apply(params, imgs))
    assert got.shape == (2, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_cli_eval_is_autodetects_converted_checkpoint(converted_npz, tmp_path,
                                                      capsys):
    """main.evaluate --eval-is picks up <data_dir>/inception.npz and produces
    a finite IS through the full generate→classify→score pipeline."""
    import dataclasses
    import shutil

    import main as cli
    from tests.helpers import tiny_config
    from text_to_image_tpu.train.trainer import Trainer

    _, npz = converted_npz
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    shutil.copy(npz, data_dir / "inception.npz")

    cfg = tiny_config("gancls", image_size=16).replace(
        checkpoint_dir=str(tmp_path / "ckpt"),
        sample_dir=str(tmp_path / "samples"),
        log_dir=str(tmp_path / "logs"))
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, data_dir=str(data_dir)),
        train=dataclasses.replace(cfg.train, snapshot_interval=2))
    trainer = Trainer(cfg)
    try:
        trainer.train(num_steps=2)
    finally:
        trainer.close()

    cli.evaluate(cfg, eval_is=True, is_images=20)
    out = capsys.readouterr().out
    assert "using converted classifier checkpoint" in out
    line = [ln for ln in out.splitlines() if "Inception score" in ln][0]
    mean = float(line.split(":")[1].split("±")[0])
    assert np.isfinite(mean) and 1.0 <= mean <= 5.0
