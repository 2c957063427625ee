"""Benchmark harness — north-star metric: images/sec/chip, GAN-CLS 64×64
training (BASELINE.json: "images/sec/chip @64×64 GAN-CLS train").

Runs the full compiled train step (D update + 2 G updates, the reference's
schedule) on synthetic data with the flagship dims (gf=128, df=64, z=100,
embed=1024, batch 64/chip), measures steady-state throughput after warmup,
and prints ONE JSON line:

    {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
     "vs_baseline": N}

vs_baseline compares against the reference's TF1-CPU throughput.  The
reference repo publishes no numbers (BASELINE.json "published": {}) and the
reference mount was empty, so the baseline constant below is a documented
ESTIMATE of TF1-CPU GAN-CLS 64×64 throughput (single CPU, batch 64);
BASELINE.md tracks replacing it with a measured value.  The north-star target
is ≥20× that baseline.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Estimated TF1 single-CPU GAN-CLS 64x64 images/sec, used only when no
# measured baseline exists (see module docstring).
TF1_CPU_BASELINE_IMG_PER_SEC = 25.0


def _baseline() -> float:
    """Prefer the measured same-host CPU baseline (scripts/
    baseline_torch_cpu.py → BASELINE_MEASURED.json): same workload, same
    machine, torch-CPU as the TF1-era proxy.  Falls back to the documented
    estimate."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["images_per_sec"])
    except (OSError, KeyError, ValueError):
        return TF1_CPU_BASELINE_IMG_PER_SEC

WARMUP_STEPS = 3
# wide windows amortize the per-window sync (a ~40ms RTT on tunneled dev
# TPUs would otherwise inflate the per-step time by >10%)
MEASURE_STEPS = 100


def main():
    import jax

    from text_to_image_tpu.config import Config, DataConfig, TrainConfig
    from text_to_image_tpu.parallel.mesh import create_mesh
    from text_to_image_tpu.train.steps import init_train_state, make_train_step
    from text_to_image_tpu.utils import prng
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_chips = len(jax.devices())
    env = create_mesh(data=n_chips, model=1)
    per_chip_batch = 64
    batch = per_chip_batch * n_chips

    cfg = Config(
        model="gancls",
        train=TrainConfig(batch_size=batch, g_steps=2),
        data=DataConfig(dataset_name="synthetic", image_size=64),
        dtype="bfloat16",
    )

    ts = init_train_state(prng.base_key(0), cfg, steps_per_epoch=100)
    ts = jax.device_put(ts, env.replicated())
    step = make_train_step(cfg, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    k = cfg.train.n_critic
    host = {
        "real": rng.uniform(-1, 1, (k, batch, 64, 64, 3)).astype(np.float32),
        "wrong": rng.uniform(-1, 1, (k, batch, 64, 64, 3)).astype(np.float32),
        "emb": rng.normal(size=(k, batch, cfg.gan.embed_dim)).astype(np.float32),
    }
    data_sharding = NamedSharding(env.mesh, P(None, "data"))
    batch_dev = jax.device_put(host, data_sharding)

    for _ in range(WARMUP_STEPS):
        ts, metrics = step(ts, batch_dev)
    float(metrics["g_loss"])  # scalar fetch = hard sync (works on every
    # platform; block_until_ready does not actually block on tunneled TPUs)

    # median of 3 windows: robust to host-side jitter on shared machines
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            ts, metrics = step(ts, batch_dev)
        float(metrics["g_loss"])
        dt = time.perf_counter() - t0
        rates.append(MEASURE_STEPS * batch / dt)
    img_per_sec = sorted(rates)[1]
    img_per_sec_per_chip = img_per_sec / n_chips

    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 2),
        "unit": "img/s/chip (GAN-CLS 64x64 train, bf16, batch 64/chip)",
        "vs_baseline": round(img_per_sec_per_chip / _baseline(), 2),
    }))


if __name__ == "__main__":
    main()
