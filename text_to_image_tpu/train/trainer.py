"""Host training loop (rebuild of the reference's per-model trainers —
SURVEY.md §3.1 `GanClsTrainer.train` etc., one generic loop for all families).

Responsibilities left on the host (everything else is inside the compiled
step): feeding sharded batches, periodic metrics, sample grids, checkpoints,
restore-latest-on-start, and Stage-I→Stage-II cross-restore.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from text_to_image_tpu.config import Config
from text_to_image_tpu.data import get_dataset
from text_to_image_tpu.data import device as device_data
from text_to_image_tpu.data.pipeline import InputPipeline
from text_to_image_tpu.eval.sampler import make_generator_fn, sample_grid
from text_to_image_tpu.parallel.mesh import MeshEnv, create_mesh, replicated
from text_to_image_tpu.train import checkpoint as ckpt
from text_to_image_tpu.train.steps import (init_train_state,
                                           make_resident_step,
                                           make_train_step)
from text_to_image_tpu.utils import prng
from text_to_image_tpu.utils.images import save_images
from text_to_image_tpu.utils.metrics import MetricWriter, ThroughputMeter


class Trainer:
    def __init__(self, cfg: Config, dataset=None, env: Optional[MeshEnv] = None,
                 restore: bool = True):
        self.cfg = cfg
        from text_to_image_tpu.ops.pallas import fused
        fused.set_default(cfg.use_pallas)
        self.env = env or create_mesh(data=cfg.mesh.data, model=cfg.mesh.model,
                                      slices=cfg.mesh.slices)
        self.dataset = dataset if dataset is not None else get_dataset(cfg)
        self.steps_per_epoch = max(
            1, self.dataset.num_examples // cfg.train.batch_size)

        stage1 = None
        if cfg.model == "stackgan_stage2" and cfg.stage1_checkpoint:
            stage1 = self._load_stage1()

        key = prng.base_key(cfg.seed)
        ts = init_train_state(key, cfg, self.steps_per_epoch, stage1=stage1)

        run_dir = os.path.join(cfg.checkpoint_dir, cfg.model,
                               cfg.data.dataset_name)
        self.ckpt = ckpt.CheckpointManager(run_dir,
                                           async_save=cfg.async_checkpoint)
        if restore:
            ts, restored = self.ckpt.restore(ts)
            if restored is not None:
                print(f"restored checkpoint at step {restored}")
        self.ts = replicated(self.env, ts)

        # data path: device-resident (split staged in HBM once, batches
        # assembled inside the compiled step — data/device.py) when it fits,
        # else the host pipeline.  The resident path has no per-step
        # host→device transfer and replays exactly across restores.
        self.device_data = None
        self.pipeline = None
        tier = self._resident_tier()
        # the tiers differ in sampling semantics (the sharded tier draws
        # per-shard-uniform, mesh-size-dependent batches) — say which one
        # 'auto' picked so run logs carry the deviation
        print(f"data path: {tier or 'host-pipeline'}"
              + (" (per-shard-uniform sampling over "
                 f"{self.env.slice_size * self.env.data_size} batch-axis "
                 "devices)" if tier == "sharded" else ""))
        if tier == "sharded":
            self.device_data = device_data.stage_sharded(
                self.dataset, self.env, seed=cfg.seed)
            self.step_fn = make_resident_step(cfg, self.steps_per_epoch,
                                              self.env)
        elif tier == "replicated":
            self.device_data = device_data.stage(self.dataset, self.env)
            self.step_fn = make_resident_step(cfg, self.steps_per_epoch,
                                              self.env)
        else:
            self.step_fn = make_train_step(cfg, self.steps_per_epoch)
            self.pipeline = InputPipeline(
                self.dataset, cfg.train.batch_size, self.env,
                window=cfg.data.caption_window,
                batches_per_step=cfg.train.n_critic,
                prefetch=cfg.data.prefetch,
                workers=cfg.data.workers)
        self.metrics = MetricWriter(
            os.path.join(cfg.log_dir, cfg.model, cfg.data.dataset_name))
        self.meter = ThroughputMeter(
            cfg.train.batch_size * cfg.train.n_critic)

        # fixed eval inputs for comparable sample grids across training
        self._gen = make_generator_fn(cfg)
        n_samples = min(64, cfg.train.batch_size)
        self._sample_emb = np.asarray(
            self.dataset.test_embeddings(n_samples), np.float32)
        self._sample_key = jax.random.fold_in(key, 2**30)

    def _resident_tier(self) -> Optional[str]:
        """Data-path tier: 'replicated' (split staged per device),
        'sharded' (example dim sharded over the batch axes — datasets up to
        D× the per-chip budget, data/device.py round-4 tier), or None (host
        pipeline)."""
        mode = self.cfg.data.device_resident
        if mode == "off":
            return None
        ds = self.dataset
        stageable = all(hasattr(ds, a)
                        for a in ("images", "embeddings", "class_ids"))
        d = self.env.slice_size * self.env.data_size
        if mode in ("on", "sharded"):
            if not stageable:
                raise ValueError(
                    f"device_resident={mode} but the dataset does not "
                    "expose in-memory images/embeddings/class_ids arrays")
            if mode == "sharded" and self.cfg.train.batch_size % d:
                raise ValueError(
                    f"device_resident=sharded needs batch_size divisible "
                    f"by the {d} batch-axis devices")
            return "sharded" if mode == "sharded" else "replicated"
        # auto: replicated when the split fits the per-chip budget;
        # sharded when it fits spread over the batch-axis devices
        if not stageable:
            return None
        budget = self.cfg.data.resident_budget_mb * 2**20
        size = device_data.nbytes(ds)
        if size <= budget:
            return "replicated"
        if (d > 1 and size <= d * budget
                and self.cfg.train.batch_size % d == 0):
            return "sharded"
        return None

    def _load_stage1(self):
        """Stage-II cross-model restore: Stage-I G params from its run dir."""
        import dataclasses
        cfg1 = self.cfg.replace(
            model="stackgan_stage1",
            data=dataclasses.replace(self.cfg.data,
                                     image_size=self.cfg.data.image_size // 4))
        ts1 = init_train_state(prng.base_key(cfg1.seed), cfg1,
                               self.steps_per_epoch)
        run_dir = os.path.join(self.cfg.checkpoint_dir, "stackgan_stage1",
                               self.cfg.data.dataset_name)
        if os.path.isdir(self.cfg.stage1_checkpoint):
            run_dir = self.cfg.stage1_checkpoint
        return ckpt.load_stage1_generator(run_dir, ts1)

    # ------------------------------------------------------------------

    def train(self, num_steps: Optional[int] = None,
              eval_fn=None, eval_interval: int = 0) -> None:
        """Run to ``num_steps`` (absolute).  ``eval_fn(trainer, step)`` is
        called every ``eval_interval`` steps (and never at step 0) — the hook
        for task-specific quality trajectories / best-checkpoint selection
        (GAN quality is NOT monotone in steps; the 15k Stage-II natural run
        measured a rise-then-collapse, BASELINE.md round 5)."""
        cfg = self.cfg
        total = (num_steps if num_steps is not None
                 else cfg.train.max_epoch * self.steps_per_epoch)
        start = int(jax.device_get(self.ts.step))
        for i in range(start, total):
            feed = (self.device_data if self.device_data is not None
                    else next(self.pipeline))
            self.ts, metrics = self.step_fn(self.ts, feed)
            ips = self.meter.tick()
            if (i + 1) % cfg.train.summary_interval == 0:
                # reading a metric here is also the NaN guard: GANs diverge
                # silently, the reference would train on — we stop with the
                # last good checkpoint intact.  One stacked fetch: per-scalar
                # device_get costs a full tunnel round-trip EACH (~40 ms+ on
                # dev TPUs); stacking on device makes the summary 2 RTTs
                import jax.numpy as jnp
                names = sorted(metrics)
                vals = np.asarray(jax.device_get(
                    jnp.stack([metrics[k] for k in names])))
                host = {k: float(v) for k, v in zip(names, vals)}
                bad = [k for k, v in host.items() if not np.isfinite(v)]
                if bad:
                    self.metrics.write(i + 1, host)
                    raise FloatingPointError(
                        f"non-finite metrics {bad} at step {i+1} — "
                        f"diverged; restart from the last checkpoint "
                        f"(consider lower lr or n_critic changes)")
                if ips is not None:
                    host["images_per_sec"] = ips
                host["epoch"] = i // self.steps_per_epoch
                # memory stats are an extra device RPC — sample sparsely
                self._summaries = getattr(self, "_summaries", 0) + 1
                if self._summaries % 10 == 1:
                    from text_to_image_tpu.utils.metrics import hbm_stats
                    self._hbm = hbm_stats()
                host.update(getattr(self, "_hbm", {}))
                self.metrics.write(i + 1, host)
            if (i + 1) % cfg.train.sample_interval == 0:
                self.save_samples(i + 1)
            if (i + 1) % cfg.train.snapshot_interval == 0:
                self.save_checkpoint()
            if eval_fn is not None and eval_interval > 0 \
                    and (i + 1) % eval_interval == 0:
                eval_fn(self, i + 1)
        self.save_checkpoint()
        if self.pipeline is not None:
            self.pipeline.close()

    def save_samples(self, step: int) -> str:
        imgs = sample_grid(self._gen, self.ts, self.cfg, self._sample_emb,
                           self._sample_key)
        path = os.path.join(self.cfg.sample_dir, self.cfg.model,
                            self.cfg.data.dataset_name, f"train_{step:08d}.png")
        out = save_images(imgs, path)
        from text_to_image_tpu.utils.images import inverse_transform, merge
        self.metrics.write_image(step, "samples", merge(inverse_transform(imgs)))
        return out

    def save_checkpoint(self) -> None:
        step = int(jax.device_get(self.ts.step))
        self.ckpt.save(step, jax.device_get(self.ts))

    def close(self):
        if self.pipeline is not None:
            self.pipeline.close()
        self.metrics.close()
        self.ckpt.close()


def train_progressive(cfg: Config, total_steps: Optional[int] = None) -> None:
    """C-PGGAN full progression: one Trainer per stage, linked by ordinary
    checkpoint restores (the parameter tree is full-depth from init, so every
    stage's program consumes the same pytree — models/pggan.py).

    Stage s runs from global step (s-1)·steps_per_stage to s·steps_per_stage,
    with fade-in α ramping over the first ``fade_fraction`` of the stage
    (derived on-device from the step counter)."""
    import dataclasses

    from text_to_image_tpu.models import pggan as PG

    n = PG.num_stages(cfg.data.image_size)
    per_stage = (max(1, total_steps // n) if total_steps is not None
                 else cfg.pggan.steps_per_stage)
    # resume: skip stages the latest checkpoint already covers — a covered
    # stage's Trainer would no-op, but its init alone costs ~75 s over a
    # tunneled TPU (see .claude/skills/verify)
    run_dir = os.path.join(cfg.checkpoint_dir, cfg.model,
                           cfg.data.dataset_name)
    done = ckpt.CheckpointManager(run_dir).latest_step() or 0
    first = min(done // per_stage + 1, n)
    if first > 1:
        print(f"[pggan] checkpoint at step {done} covers stages 1..{first-1}"
              f" — resuming at stage {first}/{n}")
    for stage in range(first, n + 1):
        sub = cfg.replace(pggan=dataclasses.replace(
            cfg.pggan, stage=stage, steps_per_stage=per_stage,
            start_step=(stage - 1) * per_stage))
        print(f"[pggan] stage {stage}/{n} "
              f"({PG.stage_resolution(stage)}px, steps "
              f"{(stage - 1) * per_stage}→{stage * per_stage})")
        trainer = Trainer(sub)
        try:
            trainer.train(num_steps=stage * per_stage)
        finally:
            trainer.close()
