"""Stage-II training-dynamics A/B on natural pixels (round-4 diagnosis).

The 15k-step chained-natural run left Stage-II BELOW Stage-I (live IS 6.24
vs 6.42) with the Stage-II discriminator fully saturated for thousands of
consecutive steps (d_loss ~1e-4..1e-6, d_real/d_wrong ~1e-6..1e-9) — D too
strong at 256px on textures, a dynamics pathology, not a budget problem
(runs/r4/chained_natural_long3.log).  This harness A/Bs the candidate
fixes at a shared budget, from ONE shared Stage-I checkpoint, and
quantifies both quality (IS / cond_acc / r at 256px) and the saturation
itself (median d_loss + fraction of logged steps with d_loss < 1e-3 over
the last half of training):

  base    the shipped recipe (the measured-failing control)
  smooth  one-sided label smoothing: d_real target 0.9
          (train.coeff.real_label_smooth — Salimans et al. 2016)
  g2      g_steps=2 (two G updates per D update)
  dlr     discriminator_lr halved to 1e-4
  dthin   df_dim 64 -> 32 (half-width D at 256px)
  smooth+g2 / any '+'-joined combination

Run: python scripts/stage2_dynamics.py [stage1_steps] [stage2_steps]
         [variant[,variant...]] [--dataset natural] [--keep-stage1]
The Stage-I checkpoint is trained once into runs/s2ab/ck and reused across
variants (and across invocations with --keep-stage1).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import shutil
import time

import numpy as np

from text_to_image_tpu.config import Config

ROOT = "runs/s2ab"
N_CLASSES = 8

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from chained_stackgan import _cfg, _dataset, _train, _quality  # noqa: E402


def _variant_cfg(cfg: Config, variant: str) -> Config:
    for part in variant.split("+"):
        if part == "base":
            continue
        elif part == "smooth":
            cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, coeff=dataclasses.replace(
                    cfg.train.coeff, real_label_smooth=0.9)))
        elif part == "g2":
            cfg = cfg.replace(train=dataclasses.replace(cfg.train, g_steps=2))
        elif part == "dlr":
            cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, discriminator_lr=1e-4))
        elif part == "dthin":
            cfg = cfg.replace(gan=dataclasses.replace(cfg.gan, df_dim=32))
        else:
            raise SystemExit(f"unknown variant part {part!r}")
    return cfg


def _saturation(log_dir: str, model: str, dataset: str) -> dict:
    """Parse the run's train.jsonl: d_loss statistics over the last half."""
    path = os.path.join(log_dir, model, dataset, "train.jsonl")
    d = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "d_loss" in rec:
                d.append(rec["d_loss"])
    tail = np.asarray(d[len(d) // 2:], np.float64)
    return {"d_loss_median_tail": float(np.median(tail)),
            "d_sat_frac_tail": float((tail < 1e-3).mean()),
            "d_loss_last": float(tail[-1])}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    s1_steps = int(args[0]) if len(args) > 0 else 3000
    s2_steps = int(args[1]) if len(args) > 1 else 5000
    variants = (args[2].split(",") if len(args) > 2
                else ["base", "smooth", "g2", "dlr"])
    dataset = "natural"
    for f in flags:
        if f.startswith("--dataset"):
            dataset = f.split("=", 1)[1]
    keep_s1 = "--keep-stage1" in flags

    s1_ck = os.path.join(ROOT, "ck", "stackgan_stage1", dataset)
    if not (keep_s1 and os.path.isdir(s1_ck)):
        shutil.rmtree(ROOT, ignore_errors=True)
        cfg1 = _cfg("stackgan_stage1", 64, ROOT, dataset)
        ds64 = _dataset(64, dataset)
        t1 = _train(cfg1, ds64, s1_steps)
        q1 = _quality(t1, cfg1, ds64)
        print(f"[stage1] {q1}", flush=True)
        with open(os.path.join(ROOT, "stage1.json"), "w") as f:
            json.dump(q1, f)
        t1.close()
    else:
        print(f"[stage1] reusing checkpoint under {s1_ck}", flush=True)

    ds256 = _dataset(256, dataset)
    rows = {}
    for variant in variants:
        vroot = os.path.join(ROOT, f"v_{variant.replace('+', '_')}")
        shutil.rmtree(vroot, ignore_errors=True)
        cfg2 = _variant_cfg(_cfg("stackgan_stage2", 256, vroot, dataset),
                            variant)
        # all variants refine the SAME frozen Stage-I
        cfg2 = cfg2.replace(stage1_checkpoint=s1_ck)
        print(f"=== variant {variant}: {s2_steps} steps ===", flush=True)
        t0 = time.time()
        t2 = _train(cfg2, ds256, s2_steps)
        q = _quality(t2, cfg2, ds256)
        q.update(_saturation(cfg2.log_dir, "stackgan_stage2", dataset))
        q["wall_s"] = round(time.time() - t0, 1)
        t2.save_samples(s2_steps)
        t2.close()
        rows[variant] = q
        print(f"[{variant}] {q}", flush=True)

    print("\n=== Stage-II dynamics A/B ({} steps, {}) ===".format(
        s2_steps, dataset), flush=True)
    hdr = ("variant", "IS", "cond_acc", "r", "d_med_tail", "d_sat%")
    print("{:<12} {:>6} {:>8} {:>6} {:>11} {:>7}".format(*hdr))
    for v, q in rows.items():
        print("{:<12} {:>6.2f} {:>8.3f} {:>6.3f} {:>11.2e} {:>7.1%}".format(
            v, q["is_mean"], q["cond_acc"], q["r"],
            q["d_loss_median_tail"], q["d_sat_frac_tail"]))
    print("S2AB RESULT " + json.dumps(rows), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
