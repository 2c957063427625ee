"""Functional layer library (rebuild of the reference's ``utils/ops.py``).

The reference wraps TF1 ops: ``conv2d(k=5,s=2)``, ``deconv2d``, ``linear``,
``lrelu(0.2)``, ``batch_norm(momentum=0.9, eps=1e-5)`` and a tile-and-concat
conditioning helper (SURVEY.md §1 L1, §2 "Op library").  Here every layer is a
pure function: ``*_init(key, ...) -> params`` plus an apply function over the
params pytree.  No framework modules, no global state — params/state flow
explicitly so the whole model jits into one XLA program.

Layout is NHWC with HWIO kernels — the TPU-native convolution layout (XLA
tiles the C dim onto 128 lanes / MXU columns).  All convs go through
``lax.conv_general_dilated`` so XLA maps them onto the MXU; elementwise
epilogues (BN, lrelu, tanh) fuse into the conv outputs, with optional Pallas
fused implementations behind the same signatures in
``text_to_image_tpu.ops.pallas``.

Mixed precision: parameters live in float32; a `Policy` casts inputs and
weights to the compute dtype (bfloat16 on TPU).  BatchNorm statistics are
always accumulated in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from text_to_image_tpu.ops import initializers as init

Params = Dict[str, jax.Array]
_DIMS = ("NHWC", "HWIO", "NHWC")


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy: params float32, compute configurable."""

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.compute_dtype)

    @staticmethod
    def from_str(name: str) -> "Policy":
        return Policy(compute_dtype=jnp.dtype(name))


FP32 = Policy(compute_dtype=jnp.float32)


# --- linear -----------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, stddev: float = init.DEFAULT_STDDEV,
                use_bias: bool = True) -> Params:
    p = {"w": init.normal(key, (in_dim, out_dim), stddev)}
    if use_bias:
        p["b"] = init.zeros((out_dim,))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# --- conv2d -------------------------------------------------------------------

def conv2d_init(key, k: int, in_c: int, out_c: int,
                stddev: float = init.DEFAULT_STDDEV) -> Params:
    return {"w": init.normal(key, (k, k, in_c, out_c), stddev),
            "b": init.zeros((out_c,))}


def conv2d(p: Params, x: jax.Array, stride: int = 2, padding: str = "SAME") -> jax.Array:
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DIMS, preferred_element_type=x.dtype)
    return y + p["b"].astype(x.dtype)


# --- conv2d_transpose (reference `deconv2d`) ---------------------------------

def conv2d_transpose_init(key, k: int, in_c: int, out_c: int,
                          stddev: float = init.DEFAULT_STDDEV) -> Params:
    return {"w": init.normal(key, (k, k, in_c, out_c), stddev),
            "b": init.zeros((out_c,))}


def conv2d_transpose(p: Params, x: jax.Array, stride: int = 2,
                     padding: str = "SAME") -> jax.Array:
    """Fractionally-strided conv (TF1 ``tf.nn.conv2d_transpose`` semantics:
    k=5, s=2, SAME doubles H/W). Lowers to an MXU conv with input dilation."""
    y = lax.conv_transpose(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=_DIMS, preferred_element_type=x.dtype)
    return y + p["b"].astype(x.dtype)


# --- batch norm ---------------------------------------------------------------

def batch_norm_init(c: int, key=None) -> Tuple[Params, Params]:
    """Returns (params, state). Reference: momentum 0.9, eps 1e-5, scale init
    N(1.0, 0.02) per DCGAN-tensorflow lineage."""
    scale = init.bn_scale(key, (c,)) if key is not None else jnp.ones((c,))
    params = {"scale": scale, "bias": init.zeros((c,))}
    state = {"mean": init.zeros((c,)), "var": jnp.ones((c,), jnp.float32)}
    return params, state


def batch_norm(p: Params, state: Params, x: jax.Array, train: bool,
               momentum: float = 0.9, eps: float = 1e-5
               ) -> Tuple[jax.Array, Params]:
    """NHWC batch norm. Statistics in float32 regardless of compute dtype.

    Under data-parallel `jit` with a batch-sharded input, XLA computes the
    *global* batch statistics (inserting the cross-device all-reduce), so DP
    training is numerically equivalent to single-device training on the full
    batch (up to reduction-order rounding) — the reference's single-device BN
    dynamics are preserved.
    """
    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    y = (x32 - mean) * inv + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


_BN_ACTS = {"relu": jax.nn.relu, "lrelu": lambda x: lrelu(x),
            "tanh": jnp.tanh, "none": lambda x: x}


def batch_norm_act(p: Params, state: Params, x: jax.Array, train: bool,
                   act: str = "relu", momentum: float = 0.9, eps: float = 1e-5
                   ) -> Tuple[jax.Array, Params]:
    """``batch_norm`` followed by an activation.  When dispatch enables the
    fused ``bn_act`` Pallas kernel (``fused.use_bn_act`` — mode 'on' only;
    the round-3 A/B in BASELINE.md measured a tie, so auto keeps XLA), the
    normalize-affine + activation epilogue is expressed as ``act(x·a + b)``
    with per-channel a = γ·rsqrt(σ²+ε), b = β − μ·a and routed through the
    kernel.  The default path is bit-identical to ``batch_norm`` +
    activation; the fused affine refactoring changes only fp rounding
    order."""
    from text_to_image_tpu.ops.pallas import fused

    if not fused.use_bn_act():
        y, new_state = batch_norm(p, state, x, train, momentum, eps)
        return _BN_ACTS[act](y), new_state

    x32 = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        new_state = {
            "mean": momentum * state["mean"] + (1.0 - momentum) * mean,
            "var": momentum * state["var"] + (1.0 - momentum) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    a = lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32) - mean * a
    return fused.bn_act(x, a, b, act), new_state


# --- layer norm (WGAN-GP critic: BN is invalid under gradient penalty) --------

def layer_norm_init(c: int) -> Params:
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-example norm over (H,W,C) — the WGAN-GP replacement for BN
    (arXiv:1704.00028 §4: no batch statistics in the critic, since GP is
    defined w.r.t. each input independently)."""
    x32 = x.astype(jnp.float32)
    # statistics at rank 1, not keepdims: `var + eps` at (B,1,1,1) would
    # broadcast the constant across singleton dims, which the SPMD
    # partitioner cannot propagate shardings through (multichip dryrun
    # 'Involuntary full rematerialization' warnings)
    mean = jnp.mean(x32, axis=(1, 2, 3))
    var = jnp.var(x32, axis=(1, 2, 3))
    inv = lax.rsqrt(var + eps)
    y = (x32 - mean[:, None, None, None]) * inv[:, None, None, None]
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# --- activations / misc -------------------------------------------------------

def lrelu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour 2x upsample (StackGAN generator up-blocks)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def tile_and_concat(x: jax.Array, t: jax.Array) -> jax.Array:
    """Spatially replicate a per-example vector t[B,E] over x's HxW grid and
    concat on channels — the matching-aware conditioning join (SURVEY §3.1).
    """
    b, h, w, _ = x.shape
    tiled = jnp.broadcast_to(t[:, None, None, :], (b, h, w, t.shape[-1])).astype(x.dtype)
    return jnp.concatenate([x, tiled], axis=-1)
