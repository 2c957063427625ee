"""CLI plumbing tests (main.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as cli  # noqa: E402
from text_to_image_tpu.config import load_config  # noqa: E402


def test_parse_overrides_types():
    out = cli.parse_overrides([
        "async_checkpoint=true", "use_pallas=False", "seed=7",
        "train.generator_lr=1e-3", "model=wgancls",
        "data.dataset_name=flowers",
    ])
    assert out["async_checkpoint"] is True
    assert out["use_pallas"] is False
    assert out["seed"] == 7
    assert out["train.generator_lr"] == 1e-3
    assert out["model"] == "wgancls"
    assert out["data.dataset_name"] == "flowers"


def test_overrides_reach_config(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("model: gancls\n")
    cfg = load_config(str(p), cli.parse_overrides(
        ["async_checkpoint=true", "train.n_critic=5"]))
    assert cfg.async_checkpoint is True
    assert cfg.train.n_critic == 5
