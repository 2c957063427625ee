"""Per-stage attribution of the 256px serving forward (round-5 sweep
finding: ~950 img/s/chip flat, 6% MXU — bound by channel-thin high-res
layers, `BASELINE.md` round-5).  The PGGAN generator evaluated at stage k
IS the prefix of the stage-7 network (progressive growing), so timing the
forward at each stage and differencing attributes the cost per stage —
no profiler tooling needed, and each point is a production trace.

Also A/Bs `use_pallas` off/auto at each stage so the wide inference
dispatch table's contribution is visible per stage.

Run: python scripts/serve_profile.py [batch]
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from text_to_image_tpu.config import (Config, CoeffConfig, DataConfig,
                                      PgganConfig, TrainConfig)
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.ops.pallas import fused
from text_to_image_tpu.train.steps import init_train_state
from text_to_image_tpu.utils import prng


def _time(fn, *args, iters=30):
    y = fn(*args)
    _ = float(jax.device_get(jnp.sum(y.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    _ = float(jax.device_get(jnp.sum(y.astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters * 1e3


def main(batch=32) -> int:
    base = Config(model="pggan",
                  train=TrainConfig(batch_size=batch, n_critic=2, g_steps=1,
                                    beta1=0.0,
                                    coeff=CoeffConfig(drift_epsilon=1e-3)),
                  data=DataConfig(dataset_name="synthetic", image_size=256),
                  pggan=PgganConfig(stage=7, start_step=0),
                  dtype="bfloat16")
    ts = init_train_state(prng.base_key(0), base, 100)
    z = jax.random.normal(prng.base_key(1), (batch, base.gan.z_dim))
    emb = jax.random.normal(prng.base_key(2), (batch, base.gan.embed_dim))
    key = prng.base_key(3)
    policy = L.Policy.from_str(base.dtype)

    print(f"device: {jax.devices()[0].platform} | B={batch} | per-stage "
          f"serving forward (cumulative prefix cost; Δ = this stage's "
          f"layers incl its to_rgb swap)")
    rows = {}
    for mode in ("off", "auto"):
        prev = 0.0
        rows[mode] = []
        for stage in range(1, 8):
            import dataclasses
            cfg = base.replace(pggan=dataclasses.replace(base.pggan,
                                                         stage=stage))
            bundle = get_model(cfg)

            def gen(gp, gs, aux, z, emb, key, _b=bundle):
                img, _, _ = _b.gen_apply(gp, gs, aux, z, emb, key, False,
                                         policy)
                return img
            with fused.use_pallas(mode), fused.inference():
                ms = _time(jax.jit(gen), ts.g_params, ts.g_state, {}, z, emb,
                           key)
            res = 4 * 2 ** (stage - 1)
            print(f"  [{mode}] stage {stage} ({res}px): cum {ms:7.2f} ms | "
                  f"Δ {ms - prev:7.2f} ms", flush=True)
            rows[mode].append(ms)
            prev = ms
    print("\nstage Δ-attribution (ms):")
    print("stage  res    off     auto")
    po = pa = 0.0
    for i in range(7):
        do, da = rows["off"][i] - po, rows["auto"][i] - pa
        po, pa = rows["off"][i], rows["auto"][i]
        print(f"{i+1:>5} {4*2**i:>4}px {do:7.2f} {da:7.2f}")
    print(f"total        {rows['off'][-1]:7.2f} {rows['auto'][-1]:7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 32))
