"""Roofline audit of the heavy compiled graphs (SURVEY.md §6 / BASELINE.md).

Round 1 established the 64px GAN-CLS train step sits at ~90% of v5e HBM
bandwidth (memory-bound; kernel work exhausted).  This script makes that
audit repeatable and extends it to the 256px paths so the "speed-of-light"
claim is *stated per config*, not extrapolated: for each graph it

  1. AOT-compiles the production program and pulls XLA ``cost_analysis()``
     (FLOPs + bytes accessed = the compiler's HBM-traffic estimate),
  2. times the steady-state step on the attached device,
  3. reports achieved TFLOP/s and GB/s against the chip peaks, i.e. which
     wall the program is leaning on and how close it is.

Peaks used (printed with every row so the fractions are auditable):
TPU v5e ≈ 197 bf16 TFLOP/s (MXU), ≈ 819 GB/s HBM.

Usage:  python scripts/roofline.py [--iters 50] [--json out.json]
        python scripts/roofline.py --graphs gancls64,stage2_256
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from text_to_image_tpu.config import (Config, CoeffConfig, DataConfig,
                                      PgganConfig, TrainConfig)
from text_to_image_tpu.train.steps import _make_step_body, init_train_state
from text_to_image_tpu.utils import prng

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _train_cfg(which: str, batch: int) -> Config:
    if which == "gancls64":
        return Config(model="gancls",
                      train=TrainConfig(batch_size=batch, g_steps=2),
                      data=DataConfig(dataset_name="synthetic", image_size=64),
                      dtype="bfloat16")
    if which == "stage2_256":
        return Config(model="stackgan_stage2",
                      train=TrainConfig(batch_size=batch, g_steps=1),
                      data=DataConfig(dataset_name="synthetic",
                                      image_size=256),
                      dtype="bfloat16")
    assert which == "pggan7_256", which
    return Config(model="pggan",
                  train=TrainConfig(batch_size=batch, n_critic=2, g_steps=1,
                                    beta1=0.0,
                                    coeff=CoeffConfig(drift_epsilon=1e-3)),
                  data=DataConfig(dataset_name="synthetic", image_size=256),
                  pggan=PgganConfig(stage=7, start_step=0),
                  dtype="bfloat16")


def _feed(cfg: Config, batch: int):
    res = cfg.data.image_size
    k = cfg.train.n_critic
    rng = np.random.default_rng(0)
    return jax.device_put({
        "real": rng.integers(0, 256, (k, batch, res, res, 3), dtype=np.uint8),
        "wrong": rng.integers(0, 256, (k, batch, res, res, 3),
                              dtype=np.uint8),
        "emb": rng.normal(size=(k, batch, cfg.gan.embed_dim)
                          ).astype(np.float32),
    })


def _cost(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
    except Exception as e:  # noqa: BLE001 — backend may not expose it
        print(f"  (cost_analysis unavailable: {e!r})")
        return {}
    if isinstance(ca, (list, tuple)):  # older jax returns one dict per device
        ca = ca[0]
    return dict(ca)


def _measure(step, state, args, iters: int, images_per_step: float) -> dict:
    for _ in range(3):
        state, aux = step(state, *args)
    _ = float(jax.device_get(jax.tree.leaves(aux)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state, *args)
    _ = float(jax.device_get(jax.tree.leaves(aux)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / iters * 1e3
    return {"ms_per_step": ms, "img_per_sec": images_per_step / ms * 1e3}


def _report(name: str, cost: dict, timing: dict) -> dict:
    row = {"graph": name, **timing}
    flops = cost.get("flops", 0.0)
    byt = cost.get("bytes accessed", 0.0)
    if flops and timing:
        s = timing["ms_per_step"] / 1e3
        row.update(
            gflop_per_step=flops / 1e9,
            hbm_gb_per_step=byt / 1e9,
            achieved_tflops=flops / s / 1e12,
            achieved_gbps=byt / s / 1e9,
            pct_mxu_bf16=100 * flops / s / 1e12 / V5E_BF16_TFLOPS,
            pct_hbm_bw=100 * byt / s / 1e9 / V5E_HBM_GBPS,
        )
        bound = ("memory" if row["pct_hbm_bw"] >= row["pct_mxu_bf16"]
                 else "compute")
        row["bound"] = bound
        print(f"  {name}: {row['ms_per_step']:.2f} ms | "
              f"{row['gflop_per_step']:.0f} GFLOP, "
              f"{row['hbm_gb_per_step']:.2f} GB | "
              f"{row['achieved_tflops']:.1f} TF/s "
              f"({row['pct_mxu_bf16']:.0f}% MXU bf16 peak), "
              f"{row['achieved_gbps']:.0f} GB/s "
              f"({row['pct_hbm_bw']:.0f}% HBM BW) → {bound}-bound")
    else:
        print(f"  {name}: {timing.get('ms_per_step', float('nan')):.2f} ms "
              f"(no cost analysis)")
    return row


def audit_train(which: str, batch: int, iters: int) -> dict:
    cfg = _train_cfg(which, batch)
    body = _make_step_body(cfg.compute_key(), 100)
    ts = init_train_state(prng.base_key(0), cfg, 100)
    feed = _feed(cfg, batch)
    step = jax.jit(lambda s, b: body(s, b), donate_argnums=0)
    compiled = step.lower(ts, feed).compile()
    cost = _cost(compiled)
    # one schedule tick consumes n_critic slices of `batch` images
    images = batch * cfg.train.n_critic
    timing = _measure(step, ts, (feed,), iters, images)
    return _report(f"{which} train B{batch}", cost, timing)


def audit_serving(batch: int, iters: int) -> dict:
    """PGGAN stage-7 256px generator forward — the serving path (forward-only
    trace: the wide Pallas inference dispatch table applies)."""
    from text_to_image_tpu.models.registry import get_model
    from text_to_image_tpu.ops import layers as L
    from text_to_image_tpu.ops.pallas import fused

    cfg = _train_cfg("pggan7_256", batch)
    bundle = get_model(cfg)
    policy = L.Policy.from_str(cfg.dtype)
    ts = init_train_state(prng.base_key(0), cfg, 100)

    def gen(g_params, g_state, aux, z, emb, key):
        img, _, _ = bundle.gen_apply(g_params, g_state, aux, z, emb, key,
                                     False, policy)
        return img.astype(jnp.float32)

    z = jax.random.normal(prng.base_key(1), (batch, cfg.gan.z_dim))
    emb = jax.random.normal(prng.base_key(2), (batch, cfg.gan.embed_dim))
    key = prng.base_key(3)
    with fused.use_pallas(cfg.use_pallas), fused.inference():
        jitted = jax.jit(gen)
        compiled = jitted.lower(ts.g_params, ts.g_state, ts.aux, z, emb,
                                key).compile()
        cost = _cost(compiled)

        def step(state, *_):
            return state, jitted(ts.g_params, ts.g_state, ts.aux, z, emb, key)

        timing = _measure(step, None, (), iters, batch)
    return _report(f"pggan7_256 generator fwd B{batch} (serving)", cost,
                   timing)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--graphs",
                   default="gancls64,stage2_256,pggan7_256,serve")
    p.add_argument("--json", default="")
    args = p.parse_args()
    print(f"device: {jax.devices()[0].platform} | peaks used: "
          f"{V5E_BF16_TFLOPS:.0f} bf16 TFLOP/s, {V5E_HBM_GBPS:.0f} GB/s HBM")
    rows = []
    for g in args.graphs.split(","):
        if g == "serve":
            rows.append(audit_serving(batch=32, iters=args.iters))
        elif g == "serve_sweep":
            # throughput knee of the 256px serving path (batch 32→512):
            # where does the forward stop being dispatch/occupancy-bound
            # and hit its memory wall?
            for b in (32, 64, 128, 256, 512):
                rows.append(audit_serving(batch=b, iters=args.iters))
        elif g == "gancls64":
            rows.append(audit_train(g, batch=64, iters=args.iters))
        else:
            rows.append(audit_train(g, batch=64, iters=max(10,
                                                           args.iters // 2)))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    main()
