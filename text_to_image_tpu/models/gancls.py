"""GAN-CLS: conditional DCGAN with a matching-aware discriminator.

Rebuilds the reference's ``models/gancls/model.py`` behavior (SURVEY.md §3.1),
Reed et al. 2016 (arXiv:1605.05396):

Generator:  t = lrelu(FC(φ(text)) → 128);  h = concat(z, t) → FC → 4×4×(8·gf)
            → [deconv5×5 s2 + BN + ReLU] × (n_up−1) → deconv5×5 s2 → tanh
Discriminator: [conv5×5 s2 (+BN from layer 2) + lrelu] × n_down to 4×4×(8·df)
            → concat(tile(lrelu(FC(φ)), 4,4)) → conv1×1 + BN + lrelu
            → conv4×4 VALID → scalar logit.

TPU-first choices: NHWC/HWIO layouts, one fused XLA program per network
apply, the three discriminator streams (real/fake/wrong) evaluated as a
single vmapped call so XLA batches them into one conv of effective batch 3B
while each stream keeps its OWN BatchNorm batch statistics — exactly the
reference semantics of three separate train-mode D calls.

The architecture is resolution-generic (n_up = log2(res/4)); the same code
serves the 64-px GAN-CLS and tiny test configs.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from text_to_image_tpu.config import GanConfig
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.utils import prng


def _text_join(join_params, h: jax.Array, t: jax.Array,
               allow_pallas: bool = True) -> jax.Array:
    """conv1x1(concat(h, tile(t))) — fused Pallas kernel on TPU (the concat
    and tiled-text tensors never hit HBM), lax composition elsewhere.

    `allow_pallas=False` for the WGAN critic: the gradient penalty
    differentiates the critic twice, and the kernel's custom_vjp (like any
    custom_vjp) does not support higher-order AD — the lax composition lets
    XLA build the grad-of-grad program (SURVEY.md §7 hard part #1)."""
    from text_to_image_tpu.ops.pallas import fused
    if allow_pallas and fused.use_join():
        w = join_params["w"]                        # [1,1,Cx+E,Co]
        cx = h.shape[-1]
        return fused.conditioning_join(h, t, w[0, 0, :cx], w[0, 0, cx:],
                                       join_params["b"], "none")
    return L.conv2d(join_params, L.tile_and_concat(h, t), stride=1)


def _up_deconv(p: Dict, x: jax.Array, act: str = "none") -> jax.Array:
    """Generator up-block deconv (k5 s2) with bias (+activation) fused —
    the Pallas subpixel kernel on TPU, lax elsewhere.  Safe under every
    family: G is only ever differentiated first-order (the WGAN GP
    double-backprop touches the critic, not G)."""
    from text_to_image_tpu.ops.pallas import conv as pconv, fused
    if fused.use_deconv(x.shape, p["w"].shape[-1]):
        ones = jnp.ones((p["w"].shape[-1],), jnp.float32)
        return pconv.deconv5x5_s2(x, p["w"], ones, p["b"].astype(jnp.float32),
                                  act)
    y = L.conv2d_transpose(p, x, stride=2)
    return jnp.tanh(y) if act == "tanh" else y


def _n_stages(resolution: int) -> int:
    n = int(math.log2(resolution // 4))
    if 4 * (2**n) != resolution:
        raise ValueError(f"resolution {resolution} must be 4·2^n")
    return n


# --- generator -----------------------------------------------------------------

def generator_init(key, gan: GanConfig, resolution: int = 64
                   ) -> Tuple[Dict, Dict]:
    n_up = _n_stages(resolution)
    gf = gan.gf_dim
    ks = prng.split_tree(key, ("embed", "stem", "stem_bn", "ups", "out"))
    stem_c = gf * (2 ** (n_up - 1))

    params: Dict = {}
    state: Dict = {}
    params["embed"] = L.linear_init(ks["embed"], gan.embed_dim,
                                    gan.compressed_embed_dim)
    params["stem"] = L.linear_init(
        ks["stem"], gan.z_dim + gan.compressed_embed_dim, 4 * 4 * stem_c)
    params["stem_bn"], state["stem_bn"] = L.batch_norm_init(stem_c, ks["stem_bn"])

    c_in = stem_c
    for i in range(n_up - 1):
        c_out = gf * (2 ** (n_up - 2 - i))
        ki = jax.random.fold_in(ks["ups"], i)
        params[f"up{i}"] = L.conv2d_transpose_init(ki, 5, c_in, c_out)
        params[f"up{i}_bn"], state[f"up{i}_bn"] = L.batch_norm_init(
            c_out, jax.random.fold_in(ki, 1))
        c_in = c_out
    params["out"] = L.conv2d_transpose_init(ks["out"], 5, c_in, 3)
    return params, state


def generator_apply(params: Dict, state: Dict, z: jax.Array, emb: jax.Array,
                    train: bool, policy: L.Policy = L.FP32, resolution: int = 64
                    ) -> Tuple[jax.Array, Dict]:
    """z[B,z_dim], emb[B,embed_dim] → images[B,res,res,3] in tanh range."""
    n_up = _n_stages(resolution)
    z = policy.cast(z)
    emb = policy.cast(emb)
    new_state: Dict = {}

    t = L.lrelu(L.linear(params["embed"], emb))
    h = L.linear(params["stem"], jnp.concatenate([z, t], axis=-1))
    stem_c = h.shape[-1] // 16
    h = h.reshape(h.shape[0], 4, 4, stem_c)
    h, new_state["stem_bn"] = L.batch_norm_act(params["stem_bn"],
                                               state["stem_bn"], h, train)
    for i in range(n_up - 1):
        h = _up_deconv(params[f"up{i}"], h)
        h, new_state[f"up{i}_bn"] = L.batch_norm_act(
            params[f"up{i}_bn"], state[f"up{i}_bn"], h, train)
    img = _up_deconv(params["out"], h, act="tanh")
    return img, new_state


def generator_apply_inference(params: Dict, state: Dict, z: jax.Array,
                              emb: jax.Array, policy: L.Policy = L.FP32,
                              resolution: int = 64) -> jax.Array:
    """Serving-path generator: eval-mode BN (running statistics) FOLDED into
    each deconv's per-channel scale/shift, so every up-block is ONE fused
    Pallas kernel (deconv + BN + ReLU, single HBM round-trip).  Matches
    `generator_apply(train=False)` numerically."""
    n_up = _n_stages(resolution)
    z = policy.cast(z)
    emb = policy.cast(emb)

    t = L.lrelu(L.linear(params["embed"], emb))
    h = L.linear(params["stem"], jnp.concatenate([z, t], axis=-1))
    h = h.reshape(h.shape[0], 4, 4, -1)
    h, _ = L.batch_norm(params["stem_bn"], state["stem_bn"], h, train=False)
    h = jax.nn.relu(h)

    from text_to_image_tpu.ops.pallas import conv as pconv, fused
    eps = 1e-5

    def folded_deconv(p, x, a, shift, act):
        # BN folding is unconditional; the Pallas kernel runs only on shapes
        # where it measured faster (same dispatch as training) — XLA fuses
        # the scale/shift/act epilogue on the others.
        if fused.use_deconv(x.shape, p["w"].shape[-1]):
            return pconv.deconv5x5_s2(x, p["w"], a, shift, act)
        y = L.conv2d_transpose({"w": p["w"], "b": jnp.zeros_like(shift)}, x,
                               stride=2)
        y = y.astype(jnp.float32) * a + shift
        from text_to_image_tpu.ops.pallas.fused import _ACTS
        return _ACTS[act](y).astype(x.dtype)

    for i in range(n_up - 1):
        p, bn, s = params[f"up{i}"], params[f"up{i}_bn"], state[f"up{i}_bn"]
        a = (bn["scale"] * jax.lax.rsqrt(s["var"] + eps)).astype(jnp.float32)
        shift = ((p["b"] - s["mean"]) * a + bn["bias"]).astype(jnp.float32)
        h = folded_deconv(p, h, a, shift, "relu")
    out = params["out"]
    return folded_deconv(out, h, jnp.ones((3,), jnp.float32),
                         out["b"].astype(jnp.float32), "tanh")


# --- discriminator ---------------------------------------------------------------

def discriminator_init(key, gan: GanConfig, resolution: int = 64,
                       norm: str = "batch") -> Tuple[Dict, Dict]:
    """norm: 'batch' (GAN-CLS) | 'layer' | 'none' (WGAN-GP critic)."""
    n_down = _n_stages(resolution)
    df = gan.df_dim
    ks = prng.split_tree(key, ("embed", "downs", "join", "logit"))

    params: Dict = {}
    state: Dict = {}
    c_in = 3
    for i in range(n_down):
        # cap growth at 8·df: at 256 px (n_down=6) uncapped growth would hit
        # 32·df channels at the 4×4 map; the reference's 256-px D likewise
        # reduces back to 8·df before the conditioning join
        c_out = df * min(2 ** i, 8)
        ki = jax.random.fold_in(ks["downs"], i)
        params[f"down{i}"] = L.conv2d_init(ki, 5, c_in, c_out)
        if i > 0:  # reference: no norm on the first conv
            if norm == "batch":
                params[f"down{i}_bn"], state[f"down{i}_bn"] = L.batch_norm_init(
                    c_out, jax.random.fold_in(ki, 1))
            elif norm == "layer":
                params[f"down{i}_ln"] = L.layer_norm_init(c_out)
        c_in = c_out

    params["embed"] = L.linear_init(ks["embed"], gan.embed_dim,
                                    gan.compressed_embed_dim)
    params["join"] = L.conv2d_init(ks["join"], 1,
                                   c_in + gan.compressed_embed_dim, c_in)
    if norm == "batch":
        params["join_bn"], state["join_bn"] = L.batch_norm_init(
            c_in, jax.random.fold_in(ks["join"], 1))
    elif norm == "layer":
        params["join_ln"] = L.layer_norm_init(c_in)
    params["logit"] = L.conv2d_init(ks["logit"], 4, c_in, 1)
    return params, state


def discriminator_apply(params: Dict, state: Dict, x: jax.Array,
                        emb: jax.Array, train: bool,
                        policy: L.Policy = L.FP32, resolution: int = 64,
                        norm: str = "batch") -> Tuple[jax.Array, Dict]:
    """x[B,res,res,3], emb[B,embed_dim] → logits[B] (pre-sigmoid / raw critic
    score), plus new norm state."""
    n_down = _n_stages(resolution)
    x = policy.cast(x)
    emb = policy.cast(emb)
    new_state: Dict = {}

    h = x
    for i in range(n_down):
        h = L.conv2d(params[f"down{i}"], h, stride=2)
        if i > 0 and norm == "batch":
            h, new_state[f"down{i}_bn"] = L.batch_norm_act(
                params[f"down{i}_bn"], state[f"down{i}_bn"], h, train,
                act="lrelu")
        else:
            if i > 0 and norm == "layer":
                h = L.layer_norm(params[f"down{i}_ln"], h)
            h = L.lrelu(h)

    t = L.lrelu(L.linear(params["embed"], emb))
    h = _text_join(params["join"], h, t, allow_pallas=(norm != "layer"))
    if norm == "batch":
        h, new_state["join_bn"] = L.batch_norm_act(
            params["join_bn"], state["join_bn"], h, train, act="lrelu")
    else:
        if norm == "layer":
            h = L.layer_norm(params["join_ln"], h)
        h = L.lrelu(h)
    logit = L.conv2d(params["logit"], h, stride=1, padding="VALID")
    return logit.reshape(logit.shape[0]), new_state


def discriminator_apply_streams(params: Dict, state: Dict, xs: jax.Array,
                                embs: jax.Array, train: bool,
                                policy: L.Policy = L.FP32,
                                resolution: int = 64, norm: str = "batch"
                                ) -> Tuple[jax.Array, Dict]:
    """Evaluate D on S stacked streams xs[S,B,...], embs[S,B,E] in ONE call.

    vmap over the stream axis → XLA sees one conv stack of batch S·B (MXU
    efficient), while BatchNorm statistics stay per-stream, matching the
    reference's three separate train-mode D invocations.  The S per-stream
    norm states are averaged into one update (running stats are only used for
    rare eval-mode D calls; the reference's sequential-overwrite order is not
    load-bearing).
    """
    def one(x, e):
        return discriminator_apply(params, state, x, e, train, policy,
                                   resolution, norm)

    logits, states = jax.vmap(one)(xs, embs)
    new_state = jax.tree.map(lambda s: jnp.mean(s, axis=0), states)
    return logits, new_state
