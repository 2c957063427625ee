"""Shared test fixtures: tiny configs + synthetic batches sized for the
1-core CPU test environment."""

from __future__ import annotations

import dataclasses

import numpy as np

from text_to_image_tpu.config import (CoeffConfig, Config, DataConfig,
                                      GanConfig, MeshConfig, TrainConfig)


def tiny_config(model: str = "gancls", image_size: int = 16, **train_kw) -> Config:
    if model == "stackgan_stage2" and image_size < 32:
        image_size = 32  # stage2 = 4× stage1; 32 → 8px stage1 (smallest
        # resolution the up/down stacks support; ~30% faster compiles)
    return Config(
        model=model,
        gan=GanConfig(gf_dim=8, df_dim=8, z_dim=8, embed_dim=32,
                      compressed_embed_dim=16, ca_dim=16, res_blocks=1),
        train=TrainConfig(batch_size=8, max_epoch=1, snapshot_interval=10**9,
                          sample_interval=10**9, summary_interval=10**9,
                          **train_kw),
        data=DataConfig(dataset_name="synthetic", image_size=image_size),
        mesh=MeshConfig(data=-1, model=1),
        dtype="float32",
        seed=0,
    )


def make_batch(cfg: Config, n_critic: int | None = None, seed: int = 0):
    """Stacked [K,B,...] batch dict matching the train step's contract."""
    k = n_critic if n_critic is not None else cfg.train.n_critic
    b = cfg.train.batch_size
    r = cfg.data.image_size
    rng = np.random.default_rng(seed)
    return {
        "real": rng.uniform(-1, 1, (k, b, r, r, 3)).astype(np.float32),
        "wrong": rng.uniform(-1, 1, (k, b, r, r, 3)).astype(np.float32),
        "emb": rng.normal(size=(k, b, cfg.gan.embed_dim)).astype(np.float32),
    }
