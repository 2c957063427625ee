"""CLI entry point (rebuild of the reference's ``main.py`` — SURVEY.md §1 L6).

Usage mirrors the reference:
    python main.py --cfg configs/gancls_flowers.yml --train
    python main.py --cfg configs/gancls_flowers.yml            # eval/sampling

Reference-style UPPERCASE YAMLs load directly (see text_to_image_tpu.config).
"""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native text-to-image GANs")
    p.add_argument("--cfg", required=True, help="YAML config path")
    p.add_argument("--train", action="store_true", help="train (else: sample/eval)")
    p.add_argument("--steps", type=int, default=None,
                   help="override number of train steps")
    p.add_argument("--set", nargs="*", default=[],
                   metavar="KEY=VALUE", help="config overrides, e.g. model=wgancls")
    return p.parse_args()


def main():
    args = parse_args()
    from text_to_image_tpu.config import load_config

    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            import ast
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        overrides[k] = v
    cfg = load_config(args.cfg, overrides or None)

    if args.train:
        from text_to_image_tpu.train.trainer import Trainer
        trainer = Trainer(cfg)
        try:
            trainer.train(num_steps=args.steps)
        finally:
            trainer.close()
    else:
        evaluate(cfg)


def evaluate(cfg):
    """Sampling/eval path: restore latest checkpoint, emit fixed-z grids plus
    latent- and text-interpolation sweeps (SURVEY.md §3.4)."""
    import jax
    import numpy as np
    from text_to_image_tpu.data import get_dataset
    from text_to_image_tpu.eval.sampler import (
        make_generator_fn, sample_grid, latent_interpolation_grid,
        text_interpolation_grid)
    from text_to_image_tpu.train import checkpoint as ckpt
    from text_to_image_tpu.train.steps import init_train_state
    from text_to_image_tpu.utils import prng
    from text_to_image_tpu.utils.images import save_images

    dataset = get_dataset(cfg, split="test")
    key = prng.base_key(cfg.seed)
    ts = init_train_state(key, cfg)
    run_dir = os.path.join(cfg.checkpoint_dir, cfg.model, cfg.data.dataset_name)
    mgr = ckpt.CheckpointManager(run_dir)
    ts, step = mgr.restore(ts)
    if step is None:
        raise SystemExit(f"no checkpoint under {run_dir} — train first")
    print(f"sampling from step-{step} checkpoint")

    gen = make_generator_fn(cfg)
    out = os.path.join(cfg.sample_dir, cfg.model, cfg.data.dataset_name)
    emb = np.asarray(dataset.test_embeddings(64), np.float32)
    k = jax.random.fold_in(key, 1)

    save_images(sample_grid(gen, ts, cfg, emb, k),
                os.path.join(out, f"eval_grid_{step}.png"))
    imgs, grid = latent_interpolation_grid(gen, ts, cfg, emb[:8], 8,
                                           jax.random.fold_in(k, 1))
    save_images(imgs, os.path.join(out, f"z_interp_{step}.png"), grid)
    imgs, grid = text_interpolation_grid(gen, ts, cfg, emb[:8], emb[8:16], 8,
                                         jax.random.fold_in(k, 2))
    save_images(imgs, os.path.join(out, f"t_interp_{step}.png"), grid)
    print(f"wrote grids under {out}")


if __name__ == "__main__":
    main()
