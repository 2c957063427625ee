"""The compiled training step.

The reference's hot loop (SURVEY.md §3.1) crosses the Python↔runtime boundary
2–6 times per step (`sess.run(d_optim)` × n_critic, `sess.run(g_optim)` ×
g_steps).  Here the ENTIRE schedule — n_critic critic updates (each on its own
fresh data slice, via `lax.scan`), then g_steps generator updates, including
the WGAN-GP double backprop and the Adam updates for both nets — is ONE jitted
XLA program.  The host only feeds batches and reads occasional metrics.

Determinism: the step's randomness derives from ``fold_in(base_key, step)``,
so a resumed run replays identical noise.

Data parallelism: the step body is written for the *global* batch; running it
under `jax.jit` with the batch sharded over the mesh's ``data`` axis makes XLA
partition every op and insert gradient all-reduces over ICI — results are
numerically equivalent to single-device execution on the full batch
(including BatchNorm, which sees global batch statistics), differing only by
cross-device reduction-order rounding.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from text_to_image_tpu.config import Config
from text_to_image_tpu.models import losses as LL
from text_to_image_tpu.models.registry import get_model
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.train import optim
from text_to_image_tpu.train.state import TrainState, new_step_counter
from text_to_image_tpu.utils import prng


def _optimizers(cfg: Config, steps_per_epoch: int):
    g_tx = optim.generator_optimizer(cfg.train, steps_per_epoch * cfg.train.g_steps)
    d_tx = optim.discriminator_optimizer(cfg.train, steps_per_epoch * cfg.train.n_critic)
    return g_tx, d_tx


@functools.lru_cache(maxsize=64)
def _init_builder(cfg: Config, steps_per_epoch: int):
    """Cached jitted state-builder per (cfg, schedule).  Config is a frozen
    (hashable) dataclass, so repeated inits — trainer restarts, tests, eval
    paths — reuse one compiled program instead of re-tracing thousands of
    small init ops (very slow over a remote-TPU tunnel)."""
    bundle = get_model(cfg)
    g_tx, d_tx = _optimizers(cfg, steps_per_epoch)

    @jax.jit
    def build(key, stage1_in):
        kinit, ks1 = jax.random.split(key)
        g_params, g_state, d_params, d_state = bundle.init(kinit)
        aux: Dict[str, Any] = {}
        if cfg.train.ema_decay > 0:
            aux["ema_g_params"] = g_params
        if bundle.needs_stage1:
            if stage1_in is None:
                from text_to_image_tpu.models import stackgan
                s1p, s1s = stackgan.stage1_generator_init(
                    ks1, cfg.gan, cfg.data.image_size // 4)
            else:
                s1p, s1s = stage1_in
            # merge — overwriting here dropped ema_g_params for Stage-II
            # (KeyError at the first EMA lerp in _step_body)
            aux.update(stage1_g_params=s1p, stage1_g_state=s1s)
        return TrainState(
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
            step=new_step_counter(), aux=aux,
        )

    return build


def init_train_state(key, cfg: Config, steps_per_epoch: int = 1000,
                     stage1: Tuple[Any, Any] | None = None) -> TrainState:
    """Build params/state/optimizer pytrees.  For stackgan_stage2, `stage1`
    is the (params, state) of a trained Stage-I generator (loaded from its
    checkpoint); if None a freshly-initialized Stage-I is used so smoke tests
    and dry-runs work without a prior training run."""
    if stage1 is not None:
        # normalize to host arrays: committed device arrays (e.g. from a
        # checkpoint restore) would make build's outputs committed, which is
        # part of the jit executable cache key — an identical-cfg train step
        # would silently recompile (~1 min for Stage-II)
        import numpy as np
        stage1 = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), stage1)
    return _init_builder(cfg.compute_key(), steps_per_epoch)(key, stage1)


def make_train_step(cfg: Config, steps_per_epoch: int = 1000):
    """Returns jitted ``step(ts, batch) -> (ts, metrics)``.

    `batch` entries are stacked per-critic-update: real/wrong[K,B,H,W,3],
    emb[K,B,E] with K = cfg.train.n_critic (the WGAN trainer draws a fresh
    batch per critic step — SURVEY.md §3.2; K=1 for the CE families).

    Cached on (cfg.compute_key(), steps_per_epoch): configs differing only
    in paths/logging knobs share one compiled program.
    """
    return _make_train_step(cfg.compute_key(), steps_per_epoch)


@functools.lru_cache(maxsize=64)
def _make_step_body(cfg: Config, steps_per_epoch: int):
    """The un-jitted full-schedule step body ``(ts, batch) -> (ts, metrics)``
    shared by the feed-path and device-resident steps below."""
    bundle = get_model(cfg)
    policy = L.Policy.from_str(cfg.dtype)
    g_tx, d_tx = _optimizers(cfg, steps_per_epoch)
    tcfg = cfg.train
    co = tcfg.coeff
    seed = cfg.seed
    zdim = cfg.gan.z_dim

    # ---- losses ---------------------------------------------------------

    def _images(x):
        """Accept uint8 (host ships quarter-size tensors; normalization to
        the generator's tanh range happens on device) or float in [-1,1];
        then the bundle's device-side prep (PGGAN: downsample to the stage
        resolution)."""
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        if bundle.prep_images is not None:
            x = bundle.prep_images(x)
        return x

    def d_loss_fn(d_params, d_state, g_params, g_state, aux, batch, key, eps):
        # `eps` (the GP interpolation draw) is sampled OUTSIDE this function:
        # jax.grad linearizes everything here via jvp, and a jvp'd uniform
        # materializes zero-tangent broadcasts whose shardings SPMD cannot
        # propagate (round-2 multichip dryrun warnings)
        real, wrong, emb = (_images(batch["real"]), _images(batch["wrong"]),
                            batch["emb"])
        kz, kg, _ = jax.random.split(key, 3)
        z = jax.random.normal(kz, (real.shape[0], zdim), jnp.float32)
        fake, _, _ = bundle.gen_apply(g_params, g_state, aux, z, emb, kg,
                                      True, policy)
        fake = jax.lax.stop_gradient(fake)
        xs = jnp.stack([real, fake, wrong])
        embs = jnp.stack([emb, emb, emb])
        logits, new_d_state = bundle.disc_streams(d_params, d_state, aux, xs,
                                                  embs, True, policy)
        if bundle.is_wgan:
            def critic_on_images(x):
                return bundle.disc_apply(d_params, d_state, aux, x, emb, True,
                                         policy)[0]
            gp = LL.gradient_penalty(critic_on_images, real, fake, eps)
            ld = LL.wgan_cls_d_loss(logits[0], logits[1], logits[2], gp,
                                    co.mismatch_alpha, co.gp_lambda,
                                    co.drift_epsilon)
        else:
            ld = LL.gan_cls_d_loss(logits[0], logits[1], logits[2],
                                   co.real_label_smooth)
        return ld["d_loss"], (new_d_state, ld)

    def g_loss_fn(g_params, g_state, d_params, d_state, aux, batch, key):
        emb = batch["emb"]
        kz, kg, kz2, kg2 = jax.random.split(key, 4)
        z = jax.random.normal(kz, (emb.shape[0], zdim), jnp.float32)
        fake, new_g_state, gen_aux = bundle.gen_apply(g_params, g_state, aux,
                                                      z, emb, kg, True, policy)
        fake_logit, _ = bundle.disc_apply(d_params, d_state, aux, fake, emb,
                                          True, policy)
        interp_logit = None
        if tcfg.use_interpolation:
            emb_int = LL.interpolate_embeddings(emb, co.interp_beta)
            z2 = jax.random.normal(kz2, (emb.shape[0], zdim), jnp.float32)
            fake_int, _, _ = bundle.gen_apply(g_params, g_state, aux, z2,
                                              emb_int, kg2, True, policy)
            interp_logit, _ = bundle.disc_apply(d_params, d_state, aux,
                                                fake_int, emb_int, True,
                                                policy)
        if bundle.is_wgan:
            lg = LL.wgan_cls_g_loss(fake_logit)
            if interp_logit is not None:
                g_int = -jnp.mean(interp_logit.astype(jnp.float32))
                lg = {**lg, "g_interp": g_int,
                      "g_loss": lg["g_loss"] + co.interp_weight * g_int}
        else:
            lg = LL.gan_cls_g_loss(fake_logit, interp_logit, co.interp_weight)
        if bundle.has_ca:
            kl = LL.ca_kl_loss(gen_aux["mu"], gen_aux["logvar"])
            lg = {**lg, "kl": kl, "g_loss": lg["g_loss"] + co.kl * kl}
        return lg["g_loss"], (new_g_state, lg)

    d_grad = jax.grad(d_loss_fn, has_aux=True)
    g_grad = jax.grad(g_loss_fn, has_aux=True)

    # ---- the compiled schedule ------------------------------------------

    def _step_body(ts: TrainState, batch
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        # key derived inside the program (a closed-over device array would be
        # embedded as an HLO constant via a host round-trip at lowering time)
        key = prng.step_key(prng.base_key(seed), ts.step)
        d_keys = jax.random.split(jax.random.fold_in(key, 0), tcfg.n_critic)
        g_key = jax.random.fold_in(key, 1)

        # per-step schedule values derived on-device (PGGAN fade-in α)
        aux = ts.aux
        if bundle.step_aux is not None:
            aux = {**aux, **bundle.step_aux(ts.step)}

        # n_critic discriminator/critic updates, each on its own data slice
        def critic_body(carry, inp):
            d_params, d_state, d_opt = carry
            slice_b, k = inp
            # GP ε drawn here, outside the differentiated loss (same keps
            # stream as before: the third split of the per-critic key)
            keps = jax.random.split(k, 3)[2]
            eps = (prng.uniform_eps(keps, slice_b["emb"].shape[0])
                   if bundle.is_wgan else None)
            grads, (new_d_state, ld) = d_grad(
                d_params, d_state, ts.g_params, ts.g_state, aux, slice_b, k,
                eps)
            updates, d_opt = d_tx.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            return (d_params, new_d_state, d_opt), ld

        (d_params, d_state, d_opt), d_metrics = jax.lax.scan(
            critic_body, (ts.d_params, ts.d_state, ts.d_opt),
            (batch, d_keys))
        d_metrics = jax.tree.map(lambda x: x[-1], d_metrics)

        # g_steps generator updates on the last data slice, same z each time
        # (the reference reruns g_optim on the same feed_dict)
        g_batch = jax.tree.map(lambda x: x[-1], batch)
        g_params, g_state, g_opt = ts.g_params, ts.g_state, ts.g_opt
        g_metrics: Dict[str, jax.Array] = {}
        for _ in range(tcfg.g_steps):
            grads, (g_state, g_metrics) = g_grad(
                g_params, g_state, d_params, d_state, aux, g_batch, g_key)
            updates, g_opt = g_tx.update(grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, updates)

        new_aux = ts.aux
        if tcfg.ema_decay > 0:
            # Karras-style generator weight average for eval: one lerp per
            # step in f32; training always uses the live params (the EMA
            # copy is read only by eval_g_params at sample/eval time)
            decay = jnp.float32(tcfg.ema_decay)
            if tcfg.ema_rampup > 0:
                # fade-aware ramp: horizon restarts at the EMA anchor (PGGAN:
                # this stage's fade end), so during-fade weights — a blend of
                # two effective architectures — never enter the average
                t = jnp.maximum(
                    ts.step.astype(jnp.float32) - float(bundle.ema_anchor),
                    0.0)
                decay = jnp.minimum(decay, (1.0 + t) / (tcfg.ema_rampup + t))
            ema = jax.tree.map(
                lambda e, p: e + (1.0 - decay) * (p - e),
                ts.aux["ema_g_params"], g_params)
            new_aux = {**ts.aux, "ema_g_params": ema}

        new_ts = ts.replace(
            g_params=g_params, g_state=g_state, g_opt=g_opt,
            d_params=d_params, d_state=d_state, d_opt=d_opt,
            step=ts.step + 1, aux=new_aux)
        return new_ts, {**d_metrics, **g_metrics}

    return _step_body


@functools.lru_cache(maxsize=64)
def _make_train_step(cfg: Config, steps_per_epoch: int):
    from text_to_image_tpu.ops.pallas import fused

    body = jax.jit(_make_step_body(cfg, steps_per_epoch), donate_argnums=0)

    def step(ts: TrainState, batch):
        # kernel dispatch (ops/pallas/fused) reads a contextvar at TRACE
        # time; bind it to cfg.use_pallas so the lru_cached step is
        # deterministic in cfg regardless of the ambient mode
        with fused.use_pallas(cfg.use_pallas):
            return body(ts, batch)

    return step


def make_resident_step(cfg: Config, steps_per_epoch: int = 1000, env=None):
    """Returns jitted ``step(ts, data: DeviceData) -> (ts, metrics)`` — the
    device-resident data path: the whole [K, B, ...] batch (index draw, crop,
    flip, caption averaging, wrong-pair selection) is derived from
    ``fold_in(seed, step)`` INSIDE the compiled program, from dataset arrays
    staged once in HBM (data/device.py).  No per-step host→device transfer,
    and the data stream replays exactly across restarts/restores.

    Cached on (cfg.resident_key(), steps_per_epoch, env) — the sampling
    knobs (caption_window, random_crop/flip) shape this program, unlike the
    feed path's."""
    return _make_resident_step(cfg.resident_key(), steps_per_epoch, env)


@functools.lru_cache(maxsize=64)
def _make_resident_step(cfg: Config, steps_per_epoch: int, env):
    from text_to_image_tpu.data import device as DD
    from text_to_image_tpu.ops.pallas import fused

    body = _make_step_body(cfg.compute_key(), steps_per_epoch)
    dcfg, tcfg, seed = cfg.data, cfg.train, cfg.seed

    @functools.partial(jax.jit, donate_argnums=0)
    def _resident_body(ts: TrainState, data):
        key = prng.step_key(prng.base_key(seed), ts.step)
        # fold_in(key, 2): 0 and 1 are the body's critic/generator streams
        if isinstance(data, DD.ShardedDeviceData):
            # sharded-resident middle tier: each device draws its slice of
            # the batch from its own shard (jit specializes on pytree type)
            batch = DD.sample_stacked_sharded(
                data, jax.random.fold_in(key, 2), tcfg.n_critic,
                tcfg.batch_size, dcfg.image_size, dcfg.caption_window,
                dcfg.random_crop, dcfg.random_flip, env)
        else:
            batch = DD.sample_stacked(
                data, jax.random.fold_in(key, 2), tcfg.n_critic,
                tcfg.batch_size, dcfg.image_size, dcfg.caption_window,
                dcfg.random_crop, dcfg.random_flip, env)
        return body(ts, batch)

    def step(ts: TrainState, data):
        with fused.use_pallas(cfg.use_pallas):
            return _resident_body(ts, data)

    return step
