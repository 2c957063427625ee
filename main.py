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
    p.add_argument("--eval-is", action="store_true",
                   help="also compute Inception score (finetunes the eval "
                        "classifier on the dataset, reference protocol)")
    p.add_argument("--is-images", type=int, default=3000,
                   help="generated images for the IS estimate (ref: ~30k)")
    p.add_argument("--set", nargs="*", default=[],
                   metavar="KEY=VALUE", help="config overrides, e.g. model=wgancls")
    return p.parse_args()


def parse_overrides(pairs):
    """KEY=VALUE strings → typed overrides (YAML-style bools, Python
    literals, bare strings)."""
    overrides = {}
    for kv in pairs:
        k, v = kv.split("=", 1)
        low = v.strip().lower()
        if low in ("true", "false"):     # YAML-style bools from the shell
            v = low == "true"
        else:
            try:
                import ast
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
        overrides[k] = v
    return overrides


def main():
    args = parse_args()
    from text_to_image_tpu.config import load_config

    cfg = load_config(args.cfg, parse_overrides(args.set) or None)

    if args.train:
        if cfg.model == "pggan" and cfg.pggan.stage == 0:
            # full progressive-growing schedule: one compiled program per
            # stage, linked by checkpoint restores
            from text_to_image_tpu.train.trainer import train_progressive
            train_progressive(cfg, total_steps=args.steps)
            return
        from text_to_image_tpu.train.trainer import Trainer
        trainer = Trainer(cfg)
        try:
            trainer.train(num_steps=args.steps)
        finally:
            trainer.close()
    else:
        evaluate(cfg, eval_is=args.eval_is, is_images=args.is_images)


def evaluate(cfg, eval_is: bool = False, is_images: int = 3000):
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
    rows = max(1, min(8, len(emb) // 2))   # robust to tiny test splits
    imgs, grid = latent_interpolation_grid(gen, ts, cfg, emb[:rows], 8,
                                           jax.random.fold_in(k, 1))
    save_images(imgs, os.path.join(out, f"z_interp_{step}.png"), grid)
    imgs, grid = text_interpolation_grid(gen, ts, cfg, emb[:rows],
                                         emb[rows:2 * rows], 8,
                                         jax.random.fold_in(k, 2))
    save_images(imgs, os.path.join(out, f"t_interp_{step}.png"), grid)
    print(f"wrote grids under {out}")

    if eval_is:
        # reference IS protocol (SURVEY.md §3.5): a dataset-finetuned
        # Inception classifies generated images; IS over 10 splits.  A
        # converted finetuned InceptionV3 (.npz via scripts/
        # convert_inception.py) gives absolute parity with the reference's
        # numbers; without one, finetune the self-contained classifier on
        # the TRAIN split (offline fallback, same protocol).
        from text_to_image_tpu.eval.inception import compute_inception_score
        inception_npz = cfg.inception_checkpoint or os.path.join(
            cfg.data.data_dir, "inception.npz")
        if os.path.exists(inception_npz):
            from text_to_image_tpu.eval.inception import load_classifier
            print(f"using converted classifier checkpoint {inception_npz}")
            classifier = load_classifier(inception_npz)
        else:
            from text_to_image_tpu.data import get_dataset as _get
            from text_to_image_tpu.eval.classifier import (make_classifier_fn,
                                                           train_classifier)
            train_ds = _get(cfg, split="train")
            num_classes = int(train_ds.class_ids.max()) + 1
            print(f"finetuning eval classifier ({num_classes} classes)…")
            clf_params, acc = train_classifier(train_ds.images,
                                               train_ds.class_ids,
                                               num_classes, steps=300)
            print(f"classifier train accuracy {acc:.3f}")
            classifier = make_classifier_fn(clf_params)

        def gen_batch(z, e, kk):
            return gen(ts.g_params, ts.g_state, ts.aux, z, e, kk)

        mean, std = compute_inception_score(
            gen_batch, classifier, np.asarray(dataset.test_embeddings(),
                                              np.float32),
            num_images=is_images, batch_size=min(64, is_images),
            z_dim=cfg.gan.z_dim,
            seed=cfg.seed)
        print(f"Inception score: {mean:.3f} ± {std:.3f} "
              f"({is_images} images, 10 splits)")


if __name__ == "__main__":
    main()
