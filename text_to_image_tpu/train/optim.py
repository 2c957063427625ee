"""Optimizers (reference: ``tf.train.AdamOptimizer`` per network).

Adam with the DCGAN/WGAN-GP hyper-parameters from the config, plus the
StackGAN staircase LR decay (×factor every ``lr_decay_epoch`` epochs) as an
optax schedule — the decay happens inside the compiled step as a function of
the step counter, no host intervention.
"""

from __future__ import annotations

import optax

from text_to_image_tpu.config import TrainConfig


def make_schedule(base_lr: float, cfg: TrainConfig, steps_per_epoch: int):
    # clamp to int32: a huge lr_decay_epoch means "constant LR" (the PGGAN
    # recipe) and would otherwise overflow the jitted schedule's step math
    decay_steps = min(max(1, cfg.lr_decay_epoch * steps_per_epoch), 2**31 - 1)
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=decay_steps,
        decay_rate=cfg.lr_decay_factor,
        staircase=True,
    )


def generator_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    return optax.adam(make_schedule(cfg.generator_lr, cfg, steps_per_epoch),
                      b1=cfg.beta1, b2=cfg.beta2)


def discriminator_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    return optax.adam(make_schedule(cfg.discriminator_lr, cfg, steps_per_epoch),
                      b1=cfg.beta1, b2=cfg.beta2)
