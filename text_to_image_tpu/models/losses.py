"""Loss library: matching-aware CLS losses, GAN-INT, WGAN-GP, CA-KL.

Rebuilds the loss math of the reference trainers (SURVEY.md §3.1/3.2):

GAN-CLS (Reed et al. 2016, matching-aware discriminator):
    d_loss = CE(D(real, t), 1) + ½·[CE(D(fake, t), 0) + CE(D(real, t̄), 0)]
    g_loss = CE(D(fake, t), 1)

GAN-INT adds a generator-only term on interpolated embeddings
    t_int = β·t₁ + (1−β)·t₂  (β = 0.5): CE(D(G(z, t_int), t_int), 1).

WGAN-CLS (arXiv:1805.00676, conditional Wasserstein + matching-aware blend):
    d_loss = E[D(x̃,t)] − E[D(x,t)] + α·(E[D(x,t̄)] − E[D(x,t)]) + λ·GP
    g_loss = −E[D(x̃,t)]
    GP = E[(‖∇x̂ D(x̂,t)‖₂ − 1)²],  x̂ = ε·x + (1−ε)·x̃   (arXiv:1704.00028)

StackGAN conditioning augmentation (arXiv:1612.03242):
    KL(N(μ,σ²) ‖ N(0,I)) = −½·Σ(1 + log σ² − μ² − σ²)

All reductions are means over the batch so the values are batch-size
invariant; everything is jit-compatible (the GP is a jax.grad inside the loss,
so grad-of-loss is one double-backprop XLA program).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def sigmoid_ce(logits: jax.Array, labels: float) -> jax.Array:
    """Numerically-stable sigmoid cross-entropy vs a constant label, reduced
    to a scalar mean (TF1 ``sigmoid_cross_entropy_with_logits`` semantics)."""
    x = logits.astype(jnp.float32)
    z = jnp.asarray(labels, jnp.float32)
    per = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(per)


def gan_cls_d_loss(real_logit, fake_logit, wrong_logit,
                   real_label: float = 1.0) -> Dict[str, jax.Array]:
    """`real_label` < 1 is one-sided label smoothing (Salimans et al. 2016):
    only the real-stream target softens, fake/wrong stay at 0 — caps the
    optimal D(real) below certainty so D cannot saturate the real term to
    zero loss (the Stage-II 256px pathology measured in round 4)."""
    d_real = sigmoid_ce(real_logit, real_label)
    d_fake = sigmoid_ce(fake_logit, 0.0)
    d_wrong = sigmoid_ce(wrong_logit, 0.0)
    total = d_real + 0.5 * (d_fake + d_wrong)
    return {"d_loss": total, "d_real": d_real, "d_fake": d_fake, "d_wrong": d_wrong}


def gan_cls_g_loss(fake_logit, interp_logit=None, interp_weight: float = 0.5
                   ) -> Dict[str, jax.Array]:
    g = sigmoid_ce(fake_logit, 1.0)
    out = {"g_fake": g}
    if interp_logit is not None:
        g_int = sigmoid_ce(interp_logit, 1.0)
        out["g_interp"] = g_int
        g = g + interp_weight * g_int
    out["g_loss"] = g
    return out


def interpolate_embeddings(emb: jax.Array, beta: float = 0.5) -> jax.Array:
    """GAN-INT: blend each embedding with another one from the batch
    (β·t₁ + (1−β)·t₂, pairing via a batch roll — every pair is a valid
    caption pair from the data manifold)."""
    other = jnp.roll(emb, shift=1, axis=0)
    return beta * emb + (1.0 - beta) * other


def wgan_cls_d_loss(real_score, fake_score, wrong_score, gp,
                    mismatch_alpha: float, gp_lambda: float,
                    drift_epsilon: float = 0.0) -> Dict[str, jax.Array]:
    e_real = jnp.mean(real_score.astype(jnp.float32))
    e_fake = jnp.mean(fake_score.astype(jnp.float32))
    e_wrong = jnp.mean(wrong_score.astype(jnp.float32))
    wdist = e_real - e_fake
    total = (e_fake - e_real) + mismatch_alpha * (e_wrong - e_real) + gp_lambda * gp
    if drift_epsilon:
        # optional score anchoring (critic values otherwise drift freely —
        # the Wasserstein objective only constrains differences).  Anchors
        # BOTH the real and the mismatched-text scores: the gradient penalty
        # bounds the real↔fake direction but not the text direction, so the
        # matching-aware term would otherwise push D(x, t_wrong) to −∞
        # (measured in the C-PGGAN progression: d_wrong −6785 and collapse
        # with a real-only anchor)
        total = total + drift_epsilon * (
            jnp.mean(real_score.astype(jnp.float32) ** 2)
            + jnp.mean(wrong_score.astype(jnp.float32) ** 2))
    return {"d_loss": total, "w_dist": wdist, "d_wrong": e_wrong, "gp": gp}


def wgan_cls_g_loss(fake_score) -> Dict[str, jax.Array]:
    g = -jnp.mean(fake_score.astype(jnp.float32))
    return {"g_loss": g}


def gradient_penalty(critic_on_images: Callable[[jax.Array], jax.Array],
                     real: jax.Array, fake: jax.Array, eps: jax.Array
                     ) -> jax.Array:
    """WGAN-GP: (‖∇x̂ D(x̂)‖₂ − 1)² at x̂ = ε·real + (1−ε)·fake.

    `critic_on_images` must map images → per-example scores with the text
    conditioning already bound.  Implemented as jax.grad *inside* the loss:
    differentiating the surrounding d-loss yields one fused double-backprop
    XLA program (SURVEY.md §3.2 — the compile-critical piece).
    """
    # fake + ε·(real − fake) ≡ ε·real + (1−ε)·fake, without broadcasting the
    # constant 1.0 to ε's (B,1,1,1) rank — SPMD cannot propagate shardings
    # across those singleton dims (round-2 multichip dryrun warnings)
    x_hat = (fake + eps * (real - fake)).astype(jnp.float32)

    def score_sum(x):
        return jnp.sum(critic_on_images(x).astype(jnp.float32))

    grads = jax.grad(score_sum)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def ca_kl_loss(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Closed-form KL(N(μ, e^logvar) ‖ N(0, I)), mean over the batch."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    per = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    return jnp.mean(per)
