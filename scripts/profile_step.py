"""Capture a device trace of the compiled train step (SURVEY.md §5.1).

Produces a TensorBoard-loadable trace (XLA op timeline, fusion boundaries,
HBM/MXU utilization) under --out.  Usage:

    python scripts/profile_step.py [--model gancls] [--out /tmp/t2i_trace]
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax

from text_to_image_tpu.config import Config, DataConfig, TrainConfig
from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from text_to_image_tpu.utils.profiling import time_step, trace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gancls")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default="/tmp/t2i_trace")
    args = p.parse_args()

    if args.model == "stackgan_stage2" and args.image_size == 64:
        args.image_size = 256
    cfg = Config(model=args.model,
                 train=TrainConfig(batch_size=args.batch,
                                   g_steps=1 if args.model != "gancls" else 2),
                 data=DataConfig(dataset_name="synthetic",
                                 image_size=args.image_size),
                 dtype="bfloat16")
    ts = init_train_state(prng.base_key(0), cfg, steps_per_epoch=100)
    step = make_train_step(cfg, steps_per_epoch=100)
    rng = np.random.default_rng(0)
    r = args.image_size
    k = cfg.train.n_critic
    batch = jax.device_put({
        "real": rng.integers(0, 255, (k, args.batch, r, r, 3), dtype=np.uint8),
        "wrong": rng.integers(0, 255, (k, args.batch, r, r, 3), dtype=np.uint8),
        "emb": rng.normal(size=(k, args.batch, cfg.gan.embed_dim)).astype(np.float32),
    })

    timing = time_step(step, ts, batch, iters=5, warmup=2)  # compile outside trace
    print(f"pre-trace: {timing['ms_per_iter']:.2f} ms/step")

    with trace(args.out):
        for _ in range(args.steps):
            ts, m = step(ts, batch)
    # tunneled dev TPUs can reject device→host transfers around a profiling
    # session; the trace itself is already on disk either way
    try:
        _ = float(m["g_loss"])
    except Exception as e:  # noqa: BLE001
        print(f"(post-trace sync failed on this backend: {e!r})")
    print(f"trace written to {args.out} (open with TensorBoard's profile tab)")


if __name__ == "__main__":
    main()
