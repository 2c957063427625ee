"""Full C-PGGAN progression to 256 px on real hardware (VERDICT round-3 #5).

Runs all seven stages (4→256 px) of `configs/pggan_flowers_256.yml`'s recipe
on the class-structured synthetic dataset, recording per-stage step times and
stability through every fade transition, then restores the final checkpoint
and reports 256 px quality (synthetic IS + fixed-z class-color correlation)
plus a sample grid.

Run: python scripts/pggan_progression.py [steps_per_stage] [image_size]
     [synthetic|natural|natural16] [--ema[=0.999]] [--ema-rampup[=10]]
     [--resume]

``--ema`` trains with a generator weight EMA (Karras eval recipe,
train.ema_decay) and reports BOTH the EMA-params and live-params IS from
the same trained state — the A/B costs one extra eval, not a second run.

A ``natural`` third arg points the same recipe at data/natural.py (real
photograph texture crops, 304 px source for a 256 px run) — the
progressive-growing path on real pixels; each stage's program downsamples
the staged reals on device (models/pggan.py::downsample_to).

``--resume`` re-enters the stage loop at the first stage the latest
checkpoint does not cover (each stage's Trainer restores latest-on-start and
``train`` no-ops when the restored step already covers the stage), so an
interrupted progression continues instead of restarting.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import shutil
import time

import jax

from text_to_image_tpu.config import (CoeffConfig, Config, DataConfig,
                                      GanConfig, PgganConfig, TrainConfig)
from text_to_image_tpu.data import get_dataset
from text_to_image_tpu.eval.sampler import make_generator_fn, sample_grid
from text_to_image_tpu.eval.synthetic_quality import evaluate
from text_to_image_tpu.models import pggan as PG
from text_to_image_tpu.train import checkpoint as ckpt
from text_to_image_tpu.train.steps import init_train_state
from text_to_image_tpu.train.trainer import train_progressive
from text_to_image_tpu.utils import prng
from text_to_image_tpu.utils.images import save_images

ROOT = "runs/pggan256"


def _cfg(steps_per_stage: int, image_size: int, root: str,
         dataset: str = "synthetic", ema_decay: float = 0.0,
         ema_rampup: float = 0.0) -> Config:
    # the shipped configs/pggan_flowers_256.yml recipe, pointed at the
    # synthetic dataset (no network/datasets in this environment)
    return Config(
        model="pggan",
        gan=GanConfig(),
        train=TrainConfig(batch_size=32, n_critic=2, g_steps=1, beta1=0.0,
                          beta2=0.9, lr_decay_epoch=10**9,
                          summary_interval=100, sample_interval=10**9,
                          snapshot_interval=10**9, ema_decay=ema_decay,
                          ema_rampup=ema_rampup,
                          coeff=CoeffConfig(gp_lambda=10.0,
                                            drift_epsilon=1e-3)),
        data=DataConfig(dataset_name=dataset, image_size=image_size),
        pggan=PgganConfig(stage=0, steps_per_stage=steps_per_stage,
                          fade_fraction=0.5),
        dtype="bfloat16",
        checkpoint_dir=os.path.join(root, "ck"),
        sample_dir=os.path.join(root, "samples"),
        log_dir=os.path.join(root, "logs"),
    )


def main(steps_per_stage: int = 3000, image_size: int = 256,
         root: str = ROOT, resume: bool = False,
         dataset: str = "synthetic", ema_decay: float = 0.0,
         ema_rampup: float = 0.0) -> int:
    if not resume:
        shutil.rmtree(root, ignore_errors=True)
    cfg = _cfg(steps_per_stage, image_size, root, dataset, ema_decay,
               ema_rampup)
    n = PG.num_stages(image_size)
    run_dir = os.path.join(cfg.checkpoint_dir, "pggan", dataset)

    t0 = time.time()
    train_progressive(cfg)  # skips checkpoint-covered stages (resume)
    print(f"[pggan] {n}-stage progression "
          f"({n * steps_per_stage} steps total) in {time.time() - t0:.0f}s",
          flush=True)

    # final-stage eval: restore the last checkpoint into a fresh full-depth
    # state (no train-step compile needed)
    final = cfg.replace(pggan=dataclasses.replace(
        cfg.pggan, stage=n, start_step=(n - 1) * steps_per_stage))
    ds = get_dataset(final)
    ts = init_train_state(prng.base_key(cfg.seed), final, steps_per_epoch=8)
    ts, restored = ckpt.CheckpointManager(run_dir).restore(ts)
    assert restored is not None, f"no checkpoint under {run_dir}"
    print(f"[pggan] restored step {restored}", flush=True)

    gen = make_generator_fn(final)
    q = evaluate(gen, ts, final, ds, num_classes=ds.num_classes)
    print(f"[pggan {image_size}px] {q}", flush=True)
    if ema_decay > 0:
        # A/B from the SAME trained state: eval with the live params too
        # (evaluate() reads aux['ema_g_params'] when present — strip it)
        ts_live = ts.replace(aux={k: v for k, v in ts.aux.items()
                                  if k != "ema_g_params"})
        q_live = evaluate(gen, ts_live, final, ds,
                          num_classes=ds.num_classes)
        print(f"[pggan {image_size}px] LIVE-params eval (EMA off): {q_live}",
              flush=True)
        print(f"[pggan] EMA(decay={ema_decay}, rampup={ema_rampup}) IS delta: "
              f"{q['is_mean'] - q_live['is_mean']:+.2f} "
              f"(EMA {q['is_mean']:.2f} vs live {q_live['is_mean']:.2f})",
              flush=True)

    grid = sample_grid(gen, ts, final,
                       ds.test_embeddings(32).astype("float32"),
                       jax.random.PRNGKey(7))
    path = save_images(grid, os.path.join(
        "assets", f"pggan_{image_size}px_{dataset}_grid.png"))
    print(f"[pggan] grid: {path}", flush=True)

    print("PGGAN256 RESULT " + json.dumps(q), flush=True)
    ok = q["r"] > 0.9 and q["is_mean"] > 4.0
    print("PGGAN256 PASS" if ok else "PGGAN256 FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    ema = 0.0
    ema_rampup = 0.0
    argv = []
    resume = False
    for a in sys.argv[1:]:
        if a == "--resume":
            resume = True
        elif a.startswith("--ema-rampup"):
            # fade-aware decay ramp: min(decay, (1+t)/(rampup+t)), t = steps
            # past each stage's fade end (train.ema_rampup)
            ema_rampup = float(a.split("=", 1)[1]) if "=" in a else 10.0
        elif a.startswith("--ema"):
            ema = float(a.split("=", 1)[1]) if "=" in a else 0.999
        else:
            argv.append(a)
    sps = int(argv[0]) if len(argv) > 0 else 3000
    res = int(argv[1]) if len(argv) > 1 else 256
    dset = argv[2] if len(argv) > 2 else "synthetic"
    sys.exit(main(sps, res, resume=resume, dataset=dset, ema_decay=ema,
                  ema_rampup=ema_rampup))
