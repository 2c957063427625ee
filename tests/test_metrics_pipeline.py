"""MetricWriter, ThroughputMeter, multi-worker pipeline, hbm_stats."""

import json
import os
import threading

import numpy as np

from text_to_image_tpu.data.pipeline import InputPipeline
from text_to_image_tpu.data.synthetic import SyntheticDataset
from text_to_image_tpu.utils.metrics import MetricWriter, ThroughputMeter, hbm_stats


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), "t", also_print=False)
    w.write(5, {"loss": np.float32(1.5), "note": "x"})
    w.write(6, {"loss": 2.0})
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    assert lines[0] == {"step": 5, "loss": 1.5, "note": "x"}
    assert lines[1]["step"] == 6


def test_throughput_meter_excludes_first_tick():
    m = ThroughputMeter(images_per_step=10)
    assert m.tick() is None          # first tick opens the window
    assert m.tick() is not None      # second tick measures


def test_hbm_stats_shape():
    s = hbm_stats()
    assert isinstance(s, dict)
    for v in s.values():
        assert v >= 0


def test_pipeline_multiworker_produces_valid_batches():
    ds = SyntheticDataset(num_examples=64, image_size=8, embed_dim=8, seed=0)
    pipe = InputPipeline(ds, batch_size=4, env=None, batches_per_step=2,
                         workers=3, prefetch=4)
    seen = []
    for _ in range(6):
        b = next(pipe)
        assert b["real"].shape == (2, 4, 8, 8, 3)
        assert b["emb"].shape == (2, 4, 8)
        seen.append(b["emb"].sum())
    pipe.close()
    # workers draw independent streams — batches shouldn't all be identical
    assert len({round(float(s), 4) for s in seen}) > 1
    # threads actually stopped
    assert all(not t.is_alive() for t in pipe._threads)
