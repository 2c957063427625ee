"""Conditional Progressive-Growing GAN (C-PGGAN).

The reference author's companion paper (arXiv:1805.00676, same lineage as the
WGAN-CLS in this repo) describes a text-conditioned PGGAN (Karras et al. 2018,
arXiv:1710.10196) trained with the conditional Wasserstein-GP loss.  The
BASELINE.json required configs do not list it (SURVEY.md §0), so this family
is an extension beyond strict parity — included because it is the third model
of the reference author's system.

PGGAN mechanics, TPU-first:

* **One fixed-shape compiled program per stage.**  Progressive growing is a
  *schedule over separately-jitted programs*, not dynamic shapes: stage s
  trains at resolution 4·2^(s-1); `cfg.pggan.stage` is static config, so the
  existing cached `make_train_step` machinery serves PGGAN unchanged.  Stage
  transitions are ordinary checkpoint restores — the parameter tree contains
  ALL stages from init, and lower-stage programs simply never touch the
  deeper weights (zero grads ⇒ Adam no-ops).
* **Fade-in α is derived on-device** from the step counter
  (α = clip((step − start)/fade_steps, 0, 1)) via the bundle's `step_aux`
  hook — no host round-trip, no recompile per α.
* Equalized learning rate (weights stored N(0,1), He-scaled at use),
  PixelNorm in G, minibatch-stddev in D, average-pool down / nearest-neighbor
  up — all per Karras et al.; text conditioning per the author's WGAN-CLS:
  compressed embedding concat at the G input and a matching-aware tiled
  concat + 1×1 conv at D's 4×4 stage.  Loss = conditional WGAN-GP with the
  ε_drift term (`train.coeff.drift_epsilon`, PGGAN recipe: 1e-3).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from text_to_image_tpu.config import GanConfig
from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.utils import prng


def stage_resolution(stage: int) -> int:
    """Stage s trains at 4·2^(s-1): stage 1 = 4px, ..., stage 7 = 256px."""
    return 4 * 2 ** (stage - 1)


def num_stages(resolution: int) -> int:
    s = int(math.log2(resolution // 4)) + 1
    if stage_resolution(s) != resolution:
        raise ValueError(f"resolution {resolution} must be 4·2^n")
    return s


def stage_channels(stage: int, gan: GanConfig) -> int:
    """Feature width per stage, capped at 4·gf (512 for the flagship
    gf=128).  Deliberately one stage leaner than the Karras recipe: halving
    starts AT 32px (512,512,512,256,128,64,32 for gf=128, i.e. 32ch at
    256px where Karras keeps 64) — the conditional variants are small and
    the leaner tail is what the measured IS-7.65 progression recipe used
    (BASELINE.md), so the schedule is kept as-measured."""
    return max(16, min(4 * gan.gf_dim, 32 * gan.gf_dim // 2 ** stage))


# --- equalized-LR primitives --------------------------------------------------

def _eq_dense_init(key, in_dim, out_dim):
    return {"w": jax.random.normal(key, (in_dim, out_dim), jnp.float32),
            "b": jnp.zeros((out_dim,), jnp.float32)}


def _eq_dense(p, x, gain: float = math.sqrt(2.0)):
    scale = gain / math.sqrt(p["w"].shape[0])
    return x @ (p["w"] * scale).astype(x.dtype) + p["b"].astype(x.dtype)


def _eq_conv_init(key, k, cin, cout):
    return {"w": jax.random.normal(key, (k, k, cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _eq_conv(p, x, gain: float = math.sqrt(2.0), stride: int = 1):
    k, _, cin, _ = p["w"].shape
    scale = gain / math.sqrt(k * k * cin)
    y = jax.lax.conv_general_dilated(
        x, (p["w"] * scale).astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return y + p["b"].astype(x.dtype)


def pixel_norm(x, eps: float = 1e-8):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                                + eps)).astype(x.dtype)


def _avgpool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") / 4.0


def downsample_to(x, res: int):
    """Exact power-of-two average-pool downsample (device-side multi-res
    data prep: the pipeline ships full-resolution batches once)."""
    while x.shape[1] > res:
        x = _avgpool2(x)
    return x


def minibatch_stddev(x, eps: float = 1e-8):
    """Append the batch-wide mean feature stddev as one constant channel
    (Karras §3 minibatch discrimination)."""
    x32 = x.astype(jnp.float32)
    std = jnp.sqrt(jnp.var(x32, axis=0) + eps).mean()
    feat = jnp.full(x.shape[:3] + (1,), std, x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


# --- generator ----------------------------------------------------------------

def generator_init(key, gan: GanConfig, resolution: int) -> Tuple[Dict, Dict]:
    """Full-depth parameter tree: every stage's blocks + toRGB exist from
    init so the pytree shape is stage-independent (checkpoint/optimizer
    compatibility across the whole progression)."""
    n = num_stages(resolution)
    ks = prng.split_tree(key, ("embed", "ca", "stem", "blocks", "rgb"))
    params: Dict = {}
    params["embed"] = L.linear_init(ks["embed"], gan.embed_dim,
                                    gan.compressed_embed_dim)
    # conditioning augmentation (μ, logσ²) — StackGAN-style, see module doc
    params["ca"] = _eq_dense_init(ks["ca"], gan.compressed_embed_dim,
                                  2 * gan.ca_dim)
    c0 = stage_channels(1, gan)
    # stem sees BOTH the compressed embedding (direct, like WGAN-CLS) and
    # the CA sample: during the low-resolution stages the adversarial signal
    # is too weak to keep CA informative against its KL pull (measured KL
    # →0.007 through the schedule), so the direct path keeps conditioning
    # robust while CA still regularizes the text manifold
    params["stem"] = _eq_dense_init(
        ks["stem"], gan.z_dim + gan.compressed_embed_dim + gan.ca_dim,
        4 * 4 * c0)
    params["stem_conv"] = _eq_conv_init(jax.random.fold_in(ks["stem"], 1),
                                        3, c0, c0)
    params["rgb1"] = _eq_conv_init(jax.random.fold_in(ks["rgb"], 1), 1, c0, 3)
    cin = c0
    for s in range(2, n + 1):
        kb = jax.random.fold_in(ks["blocks"], s)
        cout = stage_channels(s, gan)
        params[f"up{s}a"] = _eq_conv_init(kb, 3, cin, cout)
        params[f"up{s}b"] = _eq_conv_init(jax.random.fold_in(kb, 1), 3, cout,
                                          cout)
        params[f"rgb{s}"] = _eq_conv_init(jax.random.fold_in(ks["rgb"], s),
                                          1, cout, 3)
        cin = cout
    return params, {}


def generator_apply(params: Dict, z, emb, key, stage: int, alpha,
                    gan: GanConfig, policy: L.Policy = L.FP32
                    ) -> Tuple[jax.Array, Dict]:
    """z[B,z], emb[B,E], α (traced scalar) → image at stage_resolution(stage),
    plus CA aux (μ, logσ²) for the KL term."""
    z = policy.cast(z)
    emb = policy.cast(emb)
    t = L.lrelu(L.linear(params["embed"], emb))
    mu_logvar = _eq_dense(params["ca"], t, gain=1.0).astype(jnp.float32)
    mu, logvar = jnp.split(mu_logvar, 2, axis=-1)
    eps = jax.random.normal(key, mu.shape, jnp.float32)
    c = policy.cast(mu + jnp.exp(0.5 * logvar) * eps)

    h = _eq_dense(params["stem"], jnp.concatenate([z, t, c], axis=-1))
    h = h.reshape(h.shape[0], 4, 4, -1)
    h = pixel_norm(L.lrelu(h))
    h = pixel_norm(L.lrelu(_eq_conv(params["stem_conv"], h)))

    from text_to_image_tpu.ops.pallas import conv as pconv, fused

    prev_rgb = None
    for s in range(2, stage + 1):
        prev_rgb = _eq_conv(params[f"rgb{s - 1}"], h, gain=1.0)
        pa = params[f"up{s}a"]
        if fused.use_upconv(h.shape, pa["w"].shape[-1]):
            # fused up+conv3x3 (equalized-LR scale folded into the weights)
            k, _, cin, co = pa["w"].shape
            eq = math.sqrt(2.0) / math.sqrt(k * k * cin)
            h = pconv.upconv3x3_bias(h, pa["w"] * eq, pa["b"], "lrelu")
            h = pixel_norm(h)
        elif fused.use_upconv_s2d(h.shape, pa["w"].shape[-1]):
            # space-to-depth lax formulation for the channel-thin maps the
            # Pallas table leaves to XLA (fused._upconv_s2d_wins)
            k, _, cin, co = pa["w"].shape
            eq = math.sqrt(2.0) / math.sqrt(k * k * cin)
            h = pconv.upconv3x3_s2d_bias(h, pa["w"] * eq, pa["b"], "lrelu")
            h = pixel_norm(h)
        else:
            h = L.upsample_nearest(h)
            h = pixel_norm(L.lrelu(_eq_conv(pa, h)))
        h = pixel_norm(L.lrelu(_eq_conv(params[f"up{s}b"], h)))

    img = _eq_conv(params[f"rgb{stage}"], h, gain=1.0)
    if stage > 1 and prev_rgb is not None:
        a = jnp.asarray(alpha, jnp.float32).astype(img.dtype)
        img = a * img + (1 - a) * L.upsample_nearest(prev_rgb)
    return jnp.tanh(img.astype(jnp.float32)).astype(img.dtype), \
        {"mu": mu, "logvar": logvar}


# --- discriminator / critic ---------------------------------------------------

def discriminator_init(key, gan: GanConfig, resolution: int
                       ) -> Tuple[Dict, Dict]:
    n = num_stages(resolution)
    ks = prng.split_tree(key, ("from", "blocks", "embed", "join", "head"))
    params: Dict = {}
    for s in range(1, n + 1):
        cs = stage_channels(s, gan)
        params[f"from{s}"] = _eq_conv_init(jax.random.fold_in(ks["from"], s),
                                           1, 3, cs)
        if s >= 2:
            kb = jax.random.fold_in(ks["blocks"], s)
            cprev = stage_channels(s - 1, gan)
            params[f"down{s}a"] = _eq_conv_init(kb, 3, cs, cs)
            params[f"down{s}b"] = _eq_conv_init(jax.random.fold_in(kb, 1),
                                                3, cs, cprev)
    c0 = stage_channels(1, gan)
    params["embed"] = L.linear_init(ks["embed"], gan.embed_dim,
                                    gan.compressed_embed_dim)
    # matching-aware conditioning at the 4×4 map (+1 = minibatch-stddev ch)
    params["join"] = _eq_conv_init(ks["join"], 1,
                                   c0 + 1 + gan.compressed_embed_dim, c0)
    params["conv4"] = _eq_conv_init(jax.random.fold_in(ks["head"], 0),
                                    3, c0, c0)
    params["dense"] = _eq_dense_init(jax.random.fold_in(ks["head"], 1),
                                     4 * 4 * c0, c0)
    params["logit"] = _eq_dense_init(jax.random.fold_in(ks["head"], 2), c0, 1)
    return params, {}


def discriminator_apply(params: Dict, x, emb, stage: int, alpha,
                        gan: GanConfig, policy: L.Policy = L.FP32) -> jax.Array:
    """Critic score (no sigmoid — WGAN).  Stateless (no BN: GP-safe)."""
    x = policy.cast(x)
    emb = policy.cast(emb)
    h = L.lrelu(_eq_conv(params[f"from{stage}"], x, gain=1.0))
    for s in range(stage, 1, -1):
        h = L.lrelu(_eq_conv(params[f"down{s}a"], h))
        h = L.lrelu(_eq_conv(params[f"down{s}b"], h))
        h = _avgpool2(h)
        if s == stage and stage > 1:
            skip = L.lrelu(_eq_conv(params[f"from{s - 1}"], _avgpool2(x),
                                    gain=1.0))
            a = jnp.asarray(alpha, jnp.float32).astype(h.dtype)
            h = a * h + (1 - a) * skip

    h = minibatch_stddev(h)
    t = L.lrelu(L.linear(params["embed"], emb))
    h = L.tile_and_concat(h, t)
    h = L.lrelu(_eq_conv(params["join"], h, gain=1.0))
    h = L.lrelu(_eq_conv(params["conv4"], h))
    h = h.reshape(h.shape[0], -1)
    h = L.lrelu(_eq_dense(params["dense"], h))
    out = _eq_dense(params["logit"], h, gain=1.0)
    return out.reshape(out.shape[0])


def discriminator_apply_streams(params: Dict, xs, embs, stage: int, alpha,
                                gan: GanConfig, policy: L.Policy = L.FP32
                                ) -> jax.Array:
    """Stacked real/fake/wrong streams in one vmapped call (one conv stack of
    batch S·B on the MXU); minibatch-stddev stays per-stream, matching three
    separate D invocations."""
    def one(x, e):
        return discriminator_apply(params, x, e, stage, alpha, gan, policy)
    return jax.vmap(one)(xs, embs)
