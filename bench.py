"""Benchmark harness — north-star metric: images/sec/chip, GAN-CLS 64×64
training (BASELINE.json: "images/sec/chip @64×64 GAN-CLS train").

Runs the full compiled train step (D update + 2 G updates, the reference's
schedule) with the flagship dims (gf=128, df=64, z=100, embed=1024, batch
64/chip), measures steady-state throughput after warmup, and prints ONE JSON
line:

    {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s/chip",
     "vs_baseline": N, "pipeline_value": N, ...}

Four throughputs are measured each run:

* `value` — device-only: one pre-staged on-device batch stepped repeatedly
  (pure compiled-program speed, the comparable kernel number).
* `resident_value` — end-to-end on the DEFAULT data path: the split staged
  in HBM once, every batch (index draw, 76→64 random crop, flip, caption
  window-average, exact-uniform wrong-pair) assembled INSIDE the compiled
  step (data/device.py).  This is what a training run sees on datasets that
  fit HBM — no per-step host→device transfer at all.
* `sharded_resident_value` — the sharded-resident middle tier
  (data/device.py stage_sharded): example dim sharded over the batch-axis
  devices, each device draws its batch slice from its own shard.  Serves
  datasets up to D× the per-chip HBM budget; at D=1 the delta vs
  resident_value is the tier's shard_map overhead.
* `pipeline_value` — end-to-end on the host-pipeline fallback (TextDataset
  serving path: C++ crop/flip/normalize kernels, caption windowing,
  wrong-pair rejection, uint8 host→HBM transfer, prefetch threads), for
  datasets larger than HBM.  On tunneled dev TPUs this is transfer-bound.
* `sampling_value` — serving path: generator forward-only under the
  inference kernel dispatch (`eval/sampler.py` + `fused.inference()`),
  images/sec/chip at the same batch.

vs_baseline compares against the reference's TF1 single-host CPU throughput.
The reference publishes no numbers (BASELINE.json "published": {}) and the
mount was empty, so the baseline is the MORE CONSERVATIVE of (a) the measured
same-host torch-CPU proxy (BASELINE_MEASURED.json — note: this host has ONE
CPU core, so that proxy is a 1-thread number) and (b) a documented 25 img/s
estimate of a multi-core TF1-era desktop.  Taking the max avoids overstating
the multiplier on a weak bench host.  The north-star target is ≥20×.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Estimated multi-core TF1 single-host CPU GAN-CLS 64x64 images/sec (see
# module docstring). Used as a floor under the measured 1-thread proxy.
TF1_CPU_BASELINE_IMG_PER_SEC = 25.0

WARMUP_STEPS = 3
# wide windows amortize the per-window sync (a ~40ms RTT on tunneled dev
# TPUs would otherwise inflate the per-step time by >10%)
MEASURE_STEPS = 100


def _baseline() -> tuple[float, str]:
    """Conservative TF1-CPU proxy: max(measured 1-thread torch proxy,
    documented multi-core estimate)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    measured = 0.0
    try:
        with open(path) as f:
            measured = float(json.load(f)["images_per_sec"])
    except (OSError, KeyError, ValueError):
        pass
    if measured >= TF1_CPU_BASELINE_IMG_PER_SEC:
        return measured, "measured torch-CPU proxy"
    return (TF1_CPU_BASELINE_IMG_PER_SEC,
            f"25 img/s multi-core TF1-era estimate "
            f"(measured 1-thread proxy: {measured or 'n/a'})")


def _measure(step, ts, feed, batch: int, windows: int, steps: int):
    """Median images/sec over `windows` timed windows; `feed()` yields the
    batch for each step (constant for device-only, pipeline-fed otherwise)."""
    rates = []
    metrics = None
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            ts, metrics = step(ts, feed())
        float(metrics["g_loss"])  # scalar fetch = hard sync (works on every
        # platform; block_until_ready does not actually block on tunneled TPUs)
        dt = time.perf_counter() - t0
        rates.append(steps * batch / dt)
    return sorted(rates)[len(rates) // 2], ts


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64, help="per-chip batch")
    p.add_argument("--device-only", action="store_true",
                   help="skip the pipeline-fed measurement")
    p.add_argument("--pipeline-only", action="store_true",
                   help="skip the device-only measurement")
    args = p.parse_args()

    import jax

    from text_to_image_tpu.config import Config, DataConfig, TrainConfig
    from text_to_image_tpu.parallel.mesh import create_mesh
    from text_to_image_tpu.train.steps import init_train_state, make_train_step
    from text_to_image_tpu.utils import prng
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_chips = len(jax.devices())
    env = create_mesh(data=n_chips, model=1)
    per_chip_batch = args.batch
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
        "real": rng.integers(0, 256, (k, batch, 64, 64, 3), dtype=np.uint8),
        "wrong": rng.integers(0, 256, (k, batch, 64, 64, 3), dtype=np.uint8),
        "emb": rng.normal(size=(k, batch, cfg.gan.embed_dim)).astype(np.float32),
    }
    data_sharding = env.stacked_batch()
    batch_dev = jax.device_put(host, data_sharding)

    for _ in range(WARMUP_STEPS):
        ts, metrics = step(ts, batch_dev)
    float(metrics["g_loss"])

    img_per_chip = None
    if not args.pipeline_only:
        # median of 3 windows: robust to host-side jitter on shared machines
        rate, ts = _measure(step, ts, lambda: batch_dev, batch, 3, MEASURE_STEPS)
        img_per_chip = round(rate / n_chips, 2)

    # a 512-example 76px split shared by the resident and pipeline benches
    from text_to_image_tpu.data.textdataset import TextDataset
    n_ex, n_cls = 512, 16
    cls = rng.integers(0, n_cls, n_ex)
    cent = rng.normal(size=(n_cls, cfg.gan.embed_dim)).astype(np.float32)
    embs = (cent[cls][:, None, :] + 0.1 * rng.normal(
        size=(n_ex, 5, cfg.gan.embed_dim))).astype(np.float32)
    imgs = rng.integers(0, 256, (n_ex, 76, 76, 3), dtype=np.uint8)
    ds = TextDataset.from_arrays(imgs, embs, cls, image_size=64)

    resident_per_chip = None
    if not args.pipeline_only:
        try:
            from text_to_image_tpu.data import device as DD
            from text_to_image_tpu.train.steps import make_resident_step
            data = DD.stage(ds, env)
            rstep = make_resident_step(cfg, steps_per_epoch=100, env=env)
            rts = init_train_state(prng.base_key(1), cfg, steps_per_epoch=100)
            rts = jax.device_put(rts, env.replicated())
            for _ in range(WARMUP_STEPS):
                rts, metrics = rstep(rts, data)
            float(metrics["g_loss"])
            rate, rts = _measure(rstep, rts, lambda: data, batch, 3,
                                 MEASURE_STEPS)
            resident_per_chip = round(rate / n_chips, 2)
        except Exception as e:  # must never sink the harness
            resident_per_chip = f"failed: {type(e).__name__}: {e}"

    sharded_per_chip = None
    if not args.pipeline_only:
        try:
            # sharded-resident middle tier (data/device.py stage_sharded):
            # example dim sharded over the batch axes, each device draws its
            # slice of the global batch from its own shard.  On a 1-chip run
            # this degenerates to the replicated tier's work plus the
            # shard_map wrapper — the delta vs resident_value IS the tier's
            # dispatch overhead; on D chips it serves D× the dataset.
            from text_to_image_tpu.data import device as DD
            from text_to_image_tpu.train.steps import make_resident_step
            sdata = DD.stage_sharded(ds, env)
            sstep = make_resident_step(cfg, steps_per_epoch=100, env=env)
            sts = init_train_state(prng.base_key(2), cfg, steps_per_epoch=100)
            sts = jax.device_put(sts, env.replicated())
            for _ in range(WARMUP_STEPS):
                sts, metrics = sstep(sts, sdata)
            float(metrics["g_loss"])
            rate, sts = _measure(sstep, sts, lambda: sdata, batch, 3,
                                 MEASURE_STEPS)
            sharded_per_chip = round(rate / n_chips, 2)
        except Exception as e:  # must never sink the harness
            sharded_per_chip = f"failed: {type(e).__name__}: {e}"

    pipe_per_chip = None
    if not args.device_only:
        try:
            from text_to_image_tpu.data.pipeline import InputPipeline
            # workers=1 measured best on this 1-core bench host (threads
            # add GIL contention; transfers already pipeline via async
            # dispatch) — raise on real multi-core hosts
            pipe = InputPipeline(ds, batch, env=env, batches_per_step=k,
                                 prefetch=4, workers=1)
            try:
                it = iter(pipe)
                for _ in range(WARMUP_STEPS):
                    ts, metrics = step(ts, next(it))
                float(metrics["g_loss"])
                rate, ts = _measure(step, ts, lambda: next(it), batch, 3, 50)
                pipe_per_chip = round(rate / n_chips, 2)
            finally:
                pipe.close()
        except Exception as e:  # pipeline bench must never sink the harness
            pipe_per_chip = f"failed: {type(e).__name__}: {e}"

    sampling_per_chip = None
    if not args.pipeline_only:
        try:
            # serving path: generator forward under the inference dispatch
            # (eval/sampler.py) — fresh z per call, batch sharded over data.
            # Async dispatch queues the window; the tail scalar fetch syncs.
            from text_to_image_tpu.eval.sampler import make_generator_fn
            gen = make_generator_fn(cfg)
            z = jax.device_put(
                rng.normal(size=(batch, cfg.gan.z_dim)).astype(np.float32),
                env.batch())
            emb = jax.device_put(host["emb"][0], env.batch())
            key = jax.device_put(jax.random.PRNGKey(0), env.replicated())
            img = None
            for _ in range(WARMUP_STEPS):
                img = gen(ts.g_params, ts.g_state, ts.aux, z, emb, key)
            float(img[0, 0, 0, 0])
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(MEASURE_STEPS):
                    img = gen(ts.g_params, ts.g_state, ts.aux, z, emb, key)
                float(img[0, 0, 0, 0])
                rates.append(MEASURE_STEPS * batch
                             / (time.perf_counter() - t0))
            sampling_per_chip = round(sorted(rates)[1] / n_chips, 2)
        except Exception as e:  # must never sink the harness
            sampling_per_chip = f"failed: {type(e).__name__}: {e}"

    base, base_src = _baseline()
    primary = img_per_chip if img_per_chip is not None else pipe_per_chip
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": primary,
        "unit": "img/s/chip (GAN-CLS 64x64 train, bf16, batch "
                f"{per_chip_batch}/chip)",
        "vs_baseline": round(primary / base, 2)
        if isinstance(primary, (int, float)) else None,
        "resident_value": resident_per_chip,
        "sharded_resident_value": sharded_per_chip,
        "pipeline_value": pipe_per_chip,
        "sampling_value": sampling_per_chip,
        "baseline_img_per_sec": base,
        "baseline_source": base_src,
    }))


if __name__ == "__main__":
    main()
