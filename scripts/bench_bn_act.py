"""A/B the fused bn_act Pallas kernel inside full TRAINING graphs.

VERDICT round-2 #10 (stretch): route batch-norm epilogues (normalize-affine
+ activation) through the `fused.bn_act` kernel in the Stage-II training
graph and measure end-to-end.  The kernel is gated by `fused.use_bn_act`,
which this script monkeypatches per variant so everything else (upconv /
deconv / join dispatch) stays in its measured-auto state — a clean
single-kernel A/B.

    python scripts/bench_bn_act.py [--model stackgan_stage2] [--batch 64]

Results land in BASELINE.md's round-3 table.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax

from text_to_image_tpu.config import Config, DataConfig, TrainConfig
from text_to_image_tpu.ops.pallas import fused
from text_to_image_tpu.train.steps import (_make_step_body, init_train_state)
from text_to_image_tpu.utils import prng
from text_to_image_tpu.utils.profiling import time_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="stackgan_stage2")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-size", type=int, default=0)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    if args.image_size == 0:
        args.image_size = 256 if args.model == "stackgan_stage2" else 64

    cfg = Config(model=args.model,
                 train=TrainConfig(batch_size=args.batch,
                                   g_steps=2 if args.model == "gancls" else 1),
                 data=DataConfig(dataset_name="synthetic",
                                 image_size=args.image_size),
                 dtype="bfloat16")
    ts0 = init_train_state(prng.base_key(0), cfg, steps_per_epoch=100)
    body = _make_step_body(cfg.compute_key(), steps_per_epoch=100)
    rng = np.random.default_rng(0)
    r, k = args.image_size, cfg.train.n_critic
    batch = jax.device_put({
        "real": rng.integers(0, 255, (k, args.batch, r, r, 3), dtype=np.uint8),
        "wrong": rng.integers(0, 255, (k, args.batch, r, r, 3), dtype=np.uint8),
        "emb": rng.normal(size=(k, args.batch, cfg.gan.embed_dim)
                          ).astype(np.float32),
    })

    real_pred = fused.use_bn_act
    results = {}
    for variant, pred in (("xla", lambda: False), ("bn_act", lambda: True)):
        fused.use_bn_act = pred
        try:
            step = jax.jit(body)  # fresh jit per variant -> fresh trace
            t = time_step(step, ts0, batch, iters=args.iters, warmup=3)
        finally:
            fused.use_bn_act = real_pred
        results[variant] = t["ms_per_iter"]
        print(f"{args.model} {r}px b{args.batch} [{variant:6s}]: "
              f"{t['ms_per_iter']:8.2f} ms/step")

    delta = (results["bn_act"] - results["xla"]) / results["xla"] * 100
    print(f"bn_act vs XLA: {delta:+.1f}%  "
          f"({'kernel wins' if delta < 0 else 'XLA wins'})")


if __name__ == "__main__":
    main()
