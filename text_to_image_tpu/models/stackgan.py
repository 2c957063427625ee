"""StackGAN Stage-I and Stage-II (arXiv:1612.03242).

Rebuilds the reference's ``models/stackgan/stageI`` and ``stageII``
(SURVEY.md §2, §3.3):

* **Conditioning Augmentation (CA)**: FC(φ(text)) → (μ, logσ²);
  c = μ + σ⊙ε with a KL(N(μ,σ)‖N(0,I)) regularizer on the generator loss
  (weight cfg.train.coeff.kl, reference TRAIN.COEFF.KL = 2.0).
* **Stage-I G**: (c ‖ z) → FC → 4×4×(8·gf) → [nearest-up ×2 + conv3×3 + BN +
  ReLU] blocks → res×res×3 tanh (upsample+conv instead of deconv — the
  StackGAN recipe, also checkerboard-free).
* **Stage-II G**: Stage-I output (no grad, frozen Stage-I weights) →
  downsample encoder to (res/4)² → concat tiled c → 3×3 join → residual
  blocks → 4 up-blocks → (4·res)² refinement, tanh.
* Discriminators reuse the matching-aware topology from
  `text_to_image_tpu.models.gancls` (StackGAN's D is the same shape with the
  text compressed to ca_dim).

Stage-II treats the Stage-I generator as a frozen sub-network whose params
ride along in the train state but receive no gradient — the reference's
"restore Stage-I vars from checkpoint" behavior (SURVEY.md §5.4) maps to
loading those params from the Stage-I checkpoint at init.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from text_to_image_tpu.config import GanConfig
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.utils import prng


# --- Conditioning Augmentation ------------------------------------------------

def ca_init(key, embed_dim: int, ca_dim: int) -> Dict:
    return {"fc": L.linear_init(key, embed_dim, 2 * ca_dim)}


def ca_apply(params: Dict, emb: jax.Array, key
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """φ(text) → (c, μ, logσ²); c = μ + σ⊙ε (reparameterized sample)."""
    h = L.lrelu(L.linear(params["fc"], emb))
    mu, logvar = jnp.split(h, 2, axis=-1)
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    c = mu + jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mu.dtype) * eps
    return c, mu, logvar


# --- building blocks ------------------------------------------------------------

def _up_block_init(key, c_in: int, c_out: int) -> Tuple[Dict, Dict]:
    p = {"conv": L.conv2d_init(key, 3, c_in, c_out)}
    bn_p, bn_s = L.batch_norm_init(c_out, jax.random.fold_in(key, 1))
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _up_block(p: Dict, s: Dict, x: jax.Array, train: bool
              ) -> Tuple[jax.Array, Dict]:
    # Routes through the fused upconv3x3 dispatch with bn_follows=True: a
    # train-mode BatchNorm consumes the raw conv output here, and round-4
    # A/Bs show kernels in that position lose END-TO-END even though the
    # parity-adjoint backward wins every deep shape STANDALONE fwd+bwd
    # (16×16×256→128 −20%, 64×64×512→256 −30%): the custom-VJP boundary
    # breaks XLA's joint conv+BN-stats fusion — Stage-II 256px step: lax
    # 117.0 ms < route-16×16 119.2 < +32×32 122.3 < wide 136.2 (BASELINE.md
    # round-4 table; a three-times-measured negative, now encoded per-shape
    # in fused._upconv_wins instead of hardwired here).  Inference traces
    # (fused.inference(): sampler/eval) take the kernel's measured forward
    # wins directly.
    from text_to_image_tpu.ops.pallas import conv as pconv, fused
    w = p["conv"]["w"]
    if fused.use_upconv(x.shape, w.shape[-1], bn_follows=True):
        x = pconv.upconv3x3_bias(x, w, p["conv"]["b"], "none")
    elif fused.use_upconv_s2d(x.shape, w.shape[-1], bn_follows=True):
        # pure-lax space-to-depth formulation: no custom-VJP boundary, so
        # the joint conv+BN fusion survives (see fused._upconv_s2d_wins)
        x = pconv.upconv3x3_s2d_bias(x, w, p["conv"]["b"], "none")
    else:
        x = L.upsample_nearest(x, 2)
        x = L.conv2d(p["conv"], x, stride=1)
    x, bn_s = L.batch_norm_act(p["bn"], s["bn"], x, train)
    return x, {"bn": bn_s}


def _res_block_init(key, c: int) -> Tuple[Dict, Dict]:
    k1, k2 = jax.random.fold_in(key, 1), jax.random.fold_in(key, 2)
    p = {"conv1": L.conv2d_init(k1, 3, c, c), "conv2": L.conv2d_init(k2, 3, c, c)}
    p["bn1"], s1 = L.batch_norm_init(c, jax.random.fold_in(k1, 1))
    p["bn2"], s2 = L.batch_norm_init(c, jax.random.fold_in(k2, 1))
    return p, {"bn1": s1, "bn2": s2}


def _res_block(p: Dict, s: Dict, x: jax.Array, train: bool
               ) -> Tuple[jax.Array, Dict]:
    h = L.conv2d(p["conv1"], x, stride=1)
    h, s1 = L.batch_norm_act(p["bn1"], s["bn1"], h, train)
    h = L.conv2d(p["conv2"], h, stride=1)
    h, s2 = L.batch_norm(p["bn2"], s["bn2"], h, train)
    return jax.nn.relu(x + h), {"bn1": s1, "bn2": s2}


# --- Stage-I generator -----------------------------------------------------------

def stage1_generator_init(key, gan: GanConfig, resolution: int = 64
                          ) -> Tuple[Dict, Dict]:
    import math
    n_up = int(math.log2(resolution // 4))
    gf = gan.gf_dim
    ks = prng.split_tree(key, ("ca", "stem", "stem_bn", "ups", "out"))
    stem_c = gf * 8

    params: Dict = {"ca": ca_init(ks["ca"], gan.embed_dim, gan.ca_dim)}
    state: Dict = {}
    params["stem"] = L.linear_init(ks["stem"], gan.z_dim + gan.ca_dim,
                                   4 * 4 * stem_c)
    params["stem_bn"], state["stem_bn"] = L.batch_norm_init(stem_c, ks["stem_bn"])
    c_in = stem_c
    for i in range(n_up):
        c_out = max(gf // 2, stem_c // (2 ** (i + 1)))
        ki = jax.random.fold_in(ks["ups"], i)
        params[f"up{i}"], state[f"up{i}"] = _up_block_init(ki, c_in, c_out)
        c_in = c_out
    params["out"] = L.conv2d_init(ks["out"], 3, c_in, 3)
    return params, state


def stage1_generator_apply(params: Dict, state: Dict, z: jax.Array,
                           emb: jax.Array, key, train: bool,
                           policy: L.Policy = L.FP32, resolution: int = 64
                           ) -> Tuple[jax.Array, Dict, Dict]:
    """Returns (images, new_state, aux) where aux carries (mu, logvar) for the
    CA KL loss."""
    import math
    n_up = int(math.log2(resolution // 4))
    z = policy.cast(z)
    emb = policy.cast(emb)
    new_state: Dict = {}

    c, mu, logvar = ca_apply(params["ca"], emb, key)
    h = L.linear(params["stem"], jnp.concatenate([z, c], axis=-1))
    h = h.reshape(h.shape[0], 4, 4, -1)
    h, new_state["stem_bn"] = L.batch_norm_act(params["stem_bn"],
                                               state["stem_bn"], h, train)
    for i in range(n_up):
        h, new_state[f"up{i}"] = _up_block(params[f"up{i}"], state[f"up{i}"],
                                           h, train)
    img = jnp.tanh(L.conv2d(params["out"], h, stride=1))
    return img, new_state, {"mu": mu, "logvar": logvar, "c": c}


# --- Stage-II generator -----------------------------------------------------------

def stage2_generator_init(key, gan: GanConfig, lr_resolution: int = 64
                          ) -> Tuple[Dict, Dict]:
    """Refines lr_resolution → 4·lr_resolution (64 → 256 in the reference)."""
    gf = gan.gf_dim
    ks = prng.split_tree(key, ("ca", "enc", "join", "res", "ups", "out"))
    params: Dict = {"ca": ca_init(ks["ca"], gan.embed_dim, gan.ca_dim)}
    state: Dict = {}

    # encoder: conv3x3 → [conv4x4 s2 + BN + ReLU] ×2  (res → res/4)
    params["enc0"] = L.conv2d_init(jax.random.fold_in(ks["enc"], 0), 3, 3, gf)
    c_in = gf
    for i in range(1, 3):
        c_out = gf * (2 ** i)
        ki = jax.random.fold_in(ks["enc"], i)
        params[f"enc{i}"] = L.conv2d_init(ki, 4, c_in, c_out)
        params[f"enc{i}_bn"], state[f"enc{i}_bn"] = L.batch_norm_init(
            c_out, jax.random.fold_in(ki, 1))
        c_in = c_out

    # join tiled c, 3x3 back to gf*4
    params["join"] = L.conv2d_init(ks["join"], 3, c_in + gan.ca_dim, c_in)
    params["join_bn"], state["join_bn"] = L.batch_norm_init(
        c_in, jax.random.fold_in(ks["join"], 1))

    for r in range(gan.res_blocks):
        kr = jax.random.fold_in(ks["res"], r)
        params[f"res{r}"], state[f"res{r}"] = _res_block_init(kr, c_in)

    # 4 up-blocks: res/4 → 4·res, halving channels each time
    for i in range(4):
        c_out = max(gf // 2, c_in // 2)
        ki = jax.random.fold_in(ks["ups"], i)
        params[f"up{i}"], state[f"up{i}"] = _up_block_init(ki, c_in, c_out)
        c_in = c_out
    params["out"] = L.conv2d_init(ks["out"], 3, c_in, 3)
    return params, state


def stage2_generator_apply(params: Dict, state: Dict, lr_img: jax.Array,
                           emb: jax.Array, key, train: bool,
                           policy: L.Policy = L.FP32
                           ) -> Tuple[jax.Array, Dict, Dict]:
    """lr_img[B,r,r,3] (Stage-I output) → [B,4r,4r,3]."""
    lr_img = policy.cast(lr_img)
    emb = policy.cast(emb)
    new_state: Dict = {}

    c, mu, logvar = ca_apply(params["ca"], emb, key)

    h = jax.nn.relu(L.conv2d(params["enc0"], lr_img, stride=1))
    for i in range(1, 3):
        h = L.conv2d(params[f"enc{i}"], h, stride=2)
        h, new_state[f"enc{i}_bn"] = L.batch_norm_act(
            params[f"enc{i}_bn"], state[f"enc{i}_bn"], h, train)

    h = L.tile_and_concat(h, c)
    h = L.conv2d(params["join"], h, stride=1)
    h, new_state["join_bn"] = L.batch_norm_act(
        params["join_bn"], state["join_bn"], h, train)

    r = 0
    while f"res{r}" in params:
        h, new_state[f"res{r}"] = _res_block(params[f"res{r}"],
                                             state[f"res{r}"], h, train)
        r += 1
    for i in range(4):
        h, new_state[f"up{i}"] = _up_block(params[f"up{i}"], state[f"up{i}"],
                                           h, train)
    img = jnp.tanh(L.conv2d(params["out"], h, stride=1))
    return img, new_state, {"mu": mu, "logvar": logvar, "c": c}
