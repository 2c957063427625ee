"""Model registry: maps config ``model`` names onto a uniform `ModelBundle`
the trainer/eval consume (reference: ``main.py`` dispatches on the model name
in the YAML — SURVEY.md §1 L6).

Bundle surface:
* ``init(key)``                          → (g_params, g_state, d_params, d_state)
* ``gen_apply(gp, gs, aux, z, emb, key, train, policy)`` → (img, new_gs, gen_aux)
  (`aux` carries the frozen Stage-I generator for Stage-II, the PGGAN fade-in
  α, …; `gen_aux` carries CA (μ, logσ²) when the family uses conditioning
  augmentation)
* ``disc_apply(dp, ds, aux, x, emb, train, policy)`` / ``disc_streams(dp, ds,
  aux, xs, embs, train, policy)`` → (logits, new_ds) / stacked-stream logits
* optional hooks: ``step_aux(step) -> dict`` merged into `aux` inside the
  compiled step (PGGAN derives fade-in α from the step counter on-device);
  ``prep_images(x) -> x`` device-side image prep (PGGAN downsamples the
  full-res batch to the stage resolution)
* flags: ``is_wgan`` (critic + GP loss), ``has_ca`` (KL term),
  ``resolution`` (output px).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from text_to_image_tpu.config import Config
from text_to_image_tpu.models import gancls, stackgan

MODEL_NAMES = ("gancls", "wgancls", "stackgan_stage1", "stackgan_stage2",
               "pggan")


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    name: str
    resolution: int
    is_wgan: bool
    has_ca: bool
    needs_stage1: bool
    init: Callable
    gen_apply: Callable
    disc_apply: Callable
    disc_streams: Callable
    step_aux: Optional[Callable] = None
    prep_images: Optional[Callable] = None
    ema_anchor: int = 0  # global step where the fade-aware EMA ramp
    # restarts (train.ema_rampup > 0): PGGAN sets the current stage's fade
    # end so the average horizon stays inside the stationary tail


def get_model(cfg: Config) -> ModelBundle:
    name = cfg.model
    res = cfg.data.image_size
    gan = cfg.gan

    if name in ("gancls", "wgancls"):
        norm = "batch" if name == "gancls" else "layer"

        def init(key):
            kg, kd = jax.random.split(key)
            gp, gs = gancls.generator_init(kg, gan, res)
            dp, ds = gancls.discriminator_init(kd, gan, res, norm=norm)
            return gp, gs, dp, ds

        def gen_apply(gp, gs, aux, z, emb, key, train, policy):
            img, new_gs = gancls.generator_apply(gp, gs, z, emb, train,
                                                 policy, res)
            return img, new_gs, {}

        def disc_apply(dp, ds, aux, x, emb, train, policy):
            return gancls.discriminator_apply(dp, ds, x, emb, train, policy,
                                              res, norm=norm)

        def disc_streams(dp, ds, aux, xs, embs, train, policy):
            return gancls.discriminator_apply_streams(dp, ds, xs, embs, train,
                                                      policy, res, norm=norm)

        return ModelBundle(name, res, is_wgan=(name == "wgancls"),
                           has_ca=False, needs_stage1=False, init=init,
                           gen_apply=gen_apply, disc_apply=disc_apply,
                           disc_streams=disc_streams)

    if name == "stackgan_stage1":
        # StackGAN's D compresses raw text to ca_dim before the join
        d_gan = dataclasses.replace(gan, compressed_embed_dim=gan.ca_dim)

        def init(key):
            kg, kd = jax.random.split(key)
            gp, gs = stackgan.stage1_generator_init(kg, gan, res)
            dp, ds = gancls.discriminator_init(kd, d_gan, res, norm="batch")
            return gp, gs, dp, ds

        def gen_apply(gp, gs, aux, z, emb, key, train, policy):
            return stackgan.stage1_generator_apply(gp, gs, z, emb, key, train,
                                                   policy, res)

        def disc_apply(dp, ds, aux, x, emb, train, policy):
            return gancls.discriminator_apply(dp, ds, x, emb, train, policy,
                                              res, norm="batch")

        def disc_streams(dp, ds, aux, xs, embs, train, policy):
            return gancls.discriminator_apply_streams(dp, ds, xs, embs, train,
                                                      policy, res, norm="batch")

        return ModelBundle(name, res, is_wgan=False, has_ca=True,
                           needs_stage1=False, init=init,
                           gen_apply=gen_apply, disc_apply=disc_apply,
                           disc_streams=disc_streams)

    if name == "stackgan_stage2":
        lr_res = res // 4
        d_gan = dataclasses.replace(gan, compressed_embed_dim=gan.ca_dim)

        def init(key):
            kg, kd = jax.random.split(key)
            gp, gs = stackgan.stage2_generator_init(kg, gan, lr_res)
            dp, ds = gancls.discriminator_init(kd, d_gan, res, norm="batch")
            return gp, gs, dp, ds

        def gen_apply(gp, gs, aux, z, emb, key, train, policy):
            """Frozen Stage-I G produces the 64-px draft; Stage-II refines.

            Stage-I runs with batch statistics (standard GAN sampling mode)
            and its norm state/params receive no updates or gradients —
            the reference's restore-and-freeze behavior (SURVEY.md §3.3).
            """
            k1, k2 = jax.random.split(key)
            s1p = jax.lax.stop_gradient(aux["stage1_g_params"])
            s1s = jax.lax.stop_gradient(aux["stage1_g_state"])
            lr_img, _, _ = stackgan.stage1_generator_apply(
                s1p, s1s, z, emb, k1, train=True, policy=policy,
                resolution=lr_res)
            lr_img = jax.lax.stop_gradient(lr_img)
            apply = stackgan.stage2_generator_apply
            if cfg.remat:
                import functools
                apply = jax.checkpoint(
                    functools.partial(apply, train=train, policy=policy))
                return apply(gp, gs, lr_img, emb, k2)
            return apply(gp, gs, lr_img, emb, k2, train, policy)

        def disc_apply(dp, ds, aux, x, emb, train, policy):
            return gancls.discriminator_apply(dp, ds, x, emb, train, policy,
                                              res, norm="batch")

        def disc_streams(dp, ds, aux, xs, embs, train, policy):
            return gancls.discriminator_apply_streams(dp, ds, xs, embs, train,
                                                      policy, res, norm="batch")

        return ModelBundle(name, res, is_wgan=False, has_ca=True,
                           needs_stage1=True, init=init,
                           gen_apply=gen_apply, disc_apply=disc_apply,
                           disc_streams=disc_streams)

    if name == "pggan":
        import jax.numpy as jnp

        from text_to_image_tpu.models import pggan as PG

        n_total = PG.num_stages(res)
        stage = cfg.pggan.stage if cfg.pggan.stage > 0 else n_total
        if stage > n_total:
            raise ValueError(
                f"pggan.stage {stage} exceeds {n_total} stages for "
                f"image_size {res}")
        sres = PG.stage_resolution(stage)
        fade = int(cfg.pggan.steps_per_stage * cfg.pggan.fade_fraction)
        start = (cfg.pggan.start_step if cfg.pggan.start_step >= 0
                 else (stage - 1) * cfg.pggan.steps_per_stage)

        def init(key):
            kg, kd = jax.random.split(key)
            gp, gs = PG.generator_init(kg, gan, res)        # full depth
            dp, ds = PG.discriminator_init(kd, gan, res)
            return gp, gs, dp, ds

        def step_aux(step):
            if stage == 1 or fade <= 0:
                return {"alpha": jnp.float32(1.0)}
            a = (step.astype(jnp.float32) - float(start)) / float(fade)
            return {"alpha": jnp.clip(a, 0.0, 1.0)}

        def gen_apply(gp, gs, aux, z, emb, key, train, policy):
            alpha = aux.get("alpha", jnp.float32(1.0))  # eval/sampling: α=1
            img, ca = PG.generator_apply(gp, z, emb, key, stage, alpha, gan,
                                         policy)
            return img, gs, ca

        def disc_apply(dp, ds, aux, x, emb, train, policy):
            alpha = aux.get("alpha", jnp.float32(1.0))
            return PG.discriminator_apply(dp, x, emb, stage, alpha, gan,
                                          policy), ds

        def disc_streams(dp, ds, aux, xs, embs, train, policy):
            alpha = aux.get("alpha", jnp.float32(1.0))
            return PG.discriminator_apply_streams(dp, xs, embs, stage, alpha,
                                                  gan, policy), ds

        return ModelBundle(name, sres, is_wgan=True, has_ca=True,
                           needs_stage1=False, init=init,
                           gen_apply=gen_apply, disc_apply=disc_apply,
                           disc_streams=disc_streams, step_aux=step_aux,
                           prep_images=lambda x: PG.downsample_to(x, sres),
                           ema_anchor=(start + fade if stage > 1 else 0))

    raise ValueError(f"unknown model {name!r}; expected one of {MODEL_NAMES}")
