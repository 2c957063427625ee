"""The reference's flagship user journey, end-to-end on real hardware
(SURVEY.md §3.3): train StackGAN Stage-I at 64px, cross-restore its frozen
generator into Stage-II via ``stage1_checkpoint``, train Stage-II at 256px,
and report 256px quality metrics (synthetic IS with a dataset-finetuned
classifier + fixed-z class-color correlation) plus sample grids.

Runs on the class-structured synthetic dataset (no network in this
environment — SURVEY.md §6); both stages share class structure and
embeddings, so Stage-II refines exactly what Stage-I conditioned on.
A third arg selects `natural` (data/natural.py): real-photograph texture
crops at the reference source geometry (76px for Stage-I, 304px for
Stage-II) — the journey on real pixels.

Run: python scripts/chained_stackgan.py [stage1_steps] [stage2_steps]
     [synthetic|natural|natural16] [--ema[=0.999]] [--resume] [--s2-g2]
     [--traj[=1000]]
``--resume`` keeps the run dir and restores both stages from their latest
checkpoints (stages snapshot every 1000 steps) — interrupted long runs
continue instead of restarting.
``--ema`` trains both stages with a generator weight EMA (train.ema_decay,
Karras eval recipe): eval/grids sample the EMA params, Stage-II freezes the
EMA Stage-I generator, and each stage reports the live-params IS too (the
A/B from one run).  Results are appended to BASELINE.md by hand from the
printed summary.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import shutil
import time

import jax

from text_to_image_tpu.config import Config, DataConfig, GanConfig, TrainConfig
from text_to_image_tpu.data.synthetic import SyntheticDataset
from text_to_image_tpu.eval.sampler import make_generator_fn
from text_to_image_tpu.train.trainer import Trainer
from text_to_image_tpu.utils.images import save_images

ROOT = "runs/chained"
N_CLASSES = 8


def _cfg(model: str, image_size: int, root: str,
         dataset: str = "synthetic", ema_decay: float = 0.0,
         g_steps: int = 1) -> Config:
    return Config(
        model=model,
        gan=GanConfig(),  # flagship dims: gf=128, df=64, z=100, embed=1024
        # constant LR: the staircase decay is epoch-based and the synthetic
        # split's epochs are tiny (see GAN stability notes in BASELINE.md).
        # g_steps=1 (the StackGAN recipe) PASSES here despite alarming
        # running metrics (d_loss→1e-3, g_loss 6–10, CA KL ≈0.03): the
        # non-saturating CE keeps G learning and conditioning survives —
        # measured stage1 r=0.982/IS 6.71, stage2 256px r=0.949/IS 7.34.
        # snapshot every 1000 steps: long Stage-II runs survive tunnel/process
        # interruptions via --resume (same lesson as train_progressive —
        # a wedged RPC at step 12150/15000 once cost the whole stage)
        train=TrainConfig(batch_size=64, g_steps=g_steps,
                          lr_decay_epoch=10**6,
                          summary_interval=50, sample_interval=10**9,
                          snapshot_interval=1000, ema_decay=ema_decay),
        data=DataConfig(dataset_name=dataset, image_size=image_size),
        dtype="bfloat16",
        checkpoint_dir=os.path.join(root, "ck"),
        sample_dir=os.path.join(root, "samples"),
        log_dir=os.path.join(root, "logs"),
        stage1_checkpoint=(os.path.join(root, "ck", "stackgan_stage1",
                                        dataset)
                           if model == "stackgan_stage2" else ""),
    )


def _dataset(image_size: int, dataset: str = "synthetic"):
    if dataset.startswith("natural"):
        from text_to_image_tpu.data.natural import (ANCHORS, ANCHORS16,
                                                    NaturalPhotoDataset)
        return NaturalPhotoDataset(examples_per_class=64,
                                   image_size=image_size,
                                   embed_dim=1024, seed=0,
                                   anchors=(ANCHORS16 if dataset == "natural16"
                                            else ANCHORS))
    return SyntheticDataset(num_examples=512, image_size=image_size,
                            embed_dim=1024, num_classes=N_CLASSES, seed=0)


def _traj_hook(cfg: Config, ds, points: list, state: dict):
    """Trainer eval_fn: quality-trajectory eval every eval_interval steps.

    GAN quality is NOT monotone in steps — the round-5 15k g2 run rose to
    IS 7.03 by 5k then collapsed to 4.31 by 15k (BASELINE.md round 5) — so
    long runs need (a) the curve and (b) best-checkpoint selection.  On a
    new best IS the hook snapshots the full TrainState into a dedicated
    max_to_keep=1 manager (the rolling 5-deep training manager would evict
    the peak) and writes the sample grid."""
    from text_to_image_tpu.eval.synthetic_quality import evaluate
    gen = make_generator_fn(cfg)
    clf_cache = {}

    def hook(trainer, step):
        q = evaluate(gen, trainer.ts, cfg, ds,
                     getattr(ds, "num_classes", N_CLASSES),
                     clf_cache=clf_cache)
        q = dict(q, step=step)
        points.append(q)
        print(f"[{cfg.model}] TRAJ {json.dumps(q)}", flush=True)
        if q["is_mean"] > state.get("best", {}).get("is_mean", -1.0):
            state["best"] = q
            trainer.save_samples(step)
            if state.get("ckpt") is not None:
                state["ckpt"].save(step, jax.device_get(trainer.ts))
                # persist the best record beside the checkpoint so --resume
                # seeds it: otherwise a resumed run starts with best=None and
                # its first eval clobbers the true peak's checkpoint
                with open(os.path.join(state["ckpt"].directory,
                                       "best.json"), "w") as f:
                    json.dump(q, f)

    return hook


def _train(cfg: Config, ds, steps: int, resume: bool = False,
           eval_fn=None, eval_interval: int = 0) -> Trainer:
    t0 = time.time()
    t = Trainer(cfg, dataset=ds, restore=resume)
    print(f"[{cfg.model}] trainer ready in {time.time() - t0:.0f}s "
          f"(init + HBM staging); compiling step…", flush=True)
    start = int(jax.device_get(t.ts.step))
    t0 = time.time()
    t.train(num_steps=steps, eval_fn=eval_fn, eval_interval=eval_interval)
    dt = time.time() - t0
    ran = max(steps - start, 0)
    print(f"[{cfg.model}] {ran} steps (from {start}) in {dt:.0f}s "
          f"({ran / dt:.1f} steps/s, "
          f"{ran * cfg.train.batch_size / dt:.0f} img/s)", flush=True)
    return t


def _quality(t: Trainer, cfg: Config, ds) -> dict:
    from text_to_image_tpu.eval.synthetic_quality import evaluate
    n_cls = getattr(ds, "num_classes", N_CLASSES)
    q = evaluate(make_generator_fn(cfg), t.ts, cfg, ds, n_cls)
    if cfg.train.ema_decay > 0:
        # A/B from the SAME trained state: evaluate() samples from the EMA
        # params when aux carries them (eval_g_params) — strip the key to
        # get the live-params number too (same pattern as
        # scripts/pggan_progression.py).
        ts_live = t.ts.replace(aux={k: v for k, v in t.ts.aux.items()
                                    if k != "ema_g_params"})
        q_live = evaluate(make_generator_fn(cfg), ts_live, cfg, ds,
                          n_cls)
        print(f"[{cfg.model}] LIVE-params eval (EMA off): {q_live}; "
              f"EMA(decay={cfg.train.ema_decay}) IS delta "
              f"{q['is_mean'] - q_live['is_mean']:+.2f}", flush=True)
        q = dict(q, live_is_mean=q_live["is_mean"], live_r=q_live["r"])
    return q


def main(stage1_steps: int = 3000, stage2_steps: int = 3000,
         root: str = ROOT, dataset: str = "synthetic",
         ema_decay: float = 0.0, resume: bool = False,
         stage2_g_steps: int = 1, traj_interval: int = 0) -> int:
    if not resume:
        shutil.rmtree(root, ignore_errors=True)
    results = {}

    # ---- Stage-I 64px ----------------------------------------------------
    cfg1 = _cfg("stackgan_stage1", 64, root, dataset, ema_decay)
    ds64 = _dataset(64, dataset)
    t1 = _train(cfg1, ds64, stage1_steps, resume)
    results["stage1"] = _quality(t1, cfg1, ds64)
    print(f"[stage1] {results['stage1']}", flush=True)
    t1.save_samples(stage1_steps)
    t1.close()

    # ---- Stage-II 256px, frozen Stage-I restored from its checkpoint ----
    cfg2 = _cfg("stackgan_stage2", 256, root, dataset, ema_decay,
                g_steps=stage2_g_steps)
    ds256 = _dataset(256, dataset)
    eval_fn, points, tstate = None, [], {}
    if traj_interval > 0:
        from text_to_image_tpu.train.checkpoint import CheckpointManager
        tstate["ckpt"] = CheckpointManager(
            os.path.abspath(os.path.join(root, "ck", "stackgan_stage2",
                                         dataset + "_best")), max_to_keep=1)
        best_json = os.path.join(tstate["ckpt"].directory, "best.json")
        if resume and os.path.exists(best_json):
            with open(best_json) as f:
                tstate["best"] = json.load(f)
            points.append(dict(tstate["best"], resumed_seed=True))
            print(f"[stage2] resume: seeded best from {best_json}: "
                  f"{tstate['best']}", flush=True)
        eval_fn = _traj_hook(cfg2, ds256, points, tstate)
    t2 = _train(cfg2, ds256, stage2_steps, resume,
                eval_fn=eval_fn, eval_interval=traj_interval)
    if points and points[-1].get("step") == stage2_steps:
        # --traj already evaluated the final step with the run's shared
        # instrument; a redundant fresh-classifier eval here adds ~5 min
        # and once wedged on a tunnel RPC (2026-08-20, after 15k steps)
        results["stage2"] = {k: v for k, v in points[-1].items()
                             if k != "step"}
    else:
        results["stage2"] = _quality(t2, cfg2, ds256)
    print(f"[stage2] {results['stage2']}", flush=True)
    grid = t2.save_samples(stage2_steps)
    print(f"[stage2] grid: {grid}", flush=True)
    t2.close()
    if points:
        results["stage2_traj"] = points
        results["stage2_best"] = tstate["best"]
        tstate["ckpt"].close()
        print(f"[stage2] BEST over trajectory: {tstate['best']} "
              f"(final: {results['stage2']})", flush=True)

    print("CHAINED RESULT " + json.dumps(results), flush=True)
    s2 = results.get("stage2_best", results["stage2"])
    ok = (s2["r"] > 0.9 and s2["is_mean"] > 4.0)
    print("CHAINED PASS" if ok else "CHAINED FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    ema = 0.0
    resume = False
    s2_g = 1
    traj = 0
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--ema"):
            ema = float(a.split("=", 1)[1]) if "=" in a else 0.999
        elif a.startswith("--traj"):
            # Stage-II quality trajectory: eval every N steps (default 1000),
            # keep the best-IS checkpoint/grid — see _traj_hook
            traj = int(a.split("=", 1)[1]) if "=" in a else 1000
        elif a == "--resume":
            resume = True
        elif a == "--s2-g2":
            # round-5 measured Stage-II recipe on natural pixels: g_steps=2
            # keeps D off the saturation floor (BASELINE.md round-5 A/B:
            # IS 5.78 -> 7.03, beats Stage-I) — opt-in; default stays the
            # reference StackGAN schedule
            s2_g = 2
        else:
            argv.append(a)
    s1 = int(argv[0]) if len(argv) > 0 else 3000
    s2 = int(argv[1]) if len(argv) > 1 else 3000
    dset = argv[2] if len(argv) > 2 else "synthetic"
    sys.exit(main(s1, s2, dataset=dset, ema_decay=ema, resume=resume,
                  stage2_g_steps=s2_g, traj_interval=traj))
