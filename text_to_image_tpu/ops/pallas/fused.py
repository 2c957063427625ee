"""Fused Pallas TPU kernels for the conditioning/normalization hot paths.

The reference delegates all fusion to TF1's runtime; on TPU the native layer
is Pallas/Mosaic (SURVEY.md §2 native-component ledger).  XLA already fuses
conv epilogues well, so the owned kernels target what the XLA fusion pass
cannot see:

* `conditioning_join` — the matching-aware text join
  ``conv1x1(concat(x, tile(t)))`` computed as ``act(x·Wx + t·Wt + b)``
  WITHOUT materializing the [B,H,W,C+E] concat in HBM (one read of x, one of
  t, one write of y; the tiled-text tensor never exists).  Used at every
  discriminator conditioning join and the StackGAN Stage-II join.
* `bn_act` — normalize-affine + activation in one VMEM pass:
  ``act(x·a + b)`` with per-channel a,b folded from (mean, var, γ, β).

Both are `jax.custom_vjp` ops: forward is the Pallas kernel; backward is
plain XLA matmuls/reductions (also concat-free) — the activation derivative
is recovered from the saved *output* (valid for none/relu/lrelu/tanh), so no
pre-activation tensor is stored.

Verified against the `jax.lax` compositions in ``tests/test_pallas.py``
(interpret mode on CPU, compiled on TPU).  Enablement: `use_pallas` context;
auto-fallback off-TPU or for shapes that don't tile cleanly.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dispatch mode: "auto" (default) uses each kernel only on shapes where it
# measured faster than XLA on v5e (see BASELINE.md "Pallas vs XLA" and
# scripts/bench_pallas.py); "on" forces every kernel; "off" forces the lax
# path.  cfg.use_pallas carries the same three values (bools map on/off).
_MODE = contextvars.ContextVar("pallas_mode", default="auto")


def _as_mode(value) -> str:
    if isinstance(value, bool):
        return "on" if value else "off"
    if value not in ("auto", "on", "off"):
        raise ValueError(f"pallas mode {value!r} not in auto/on/off")
    return value


def pallas_enabled() -> bool:
    """True when fused kernels are FORCED on (mode 'on' + TPU backend).
    Shape-aware call sites should use the `use_*` dispatch predicates."""
    return _MODE.get() == "on" and jax.default_backend() == "tpu"


def set_default(mode) -> None:
    """Process-wide default (cfg.use_pallas → Trainer sets this)."""
    _MODE.set(_as_mode(mode))


@contextlib.contextmanager
def use_pallas(mode):
    tok = _MODE.set(_as_mode(mode))
    try:
        yield
    finally:
        _MODE.reset(tok)


# Forward-only (inference) traces flip this off; training graphs keep the
# default.  The split exists because the dispatch economics differ: in a
# training graph the custom-VJP boundary breaks XLA's joint fwd+bwd fusion
# and large-map kernels LOSE end-to-end (round-3 measurements: Stage-II
# 256px +10%, PGGAN stage-6 +11% with halo dispatch on), while in a pure
# forward the standalone wins apply directly (−31…−47% on ≥32×32 up-blocks).
_TRAINING = contextvars.ContextVar("pallas_training", default=True)


@contextlib.contextmanager
def inference():
    """Mark the enclosed trace as forward-only: auto dispatch may use the
    wider measured-win tables (no backward to pessimize).  Wrap the TRACE,
    not the call — dispatch predicates are evaluated at trace time."""
    tok = _TRAINING.set(False)
    try:
        yield
    finally:
        _TRAINING.reset(tok)


# ---- measured per-shape dispatch (auto mode) --------------------------------

def _deconv_wins(x_shape, co: int) -> bool:
    """Shapes where the Pallas subpixel deconv beat XLA on v5e (BASELINE.md):
    the deep small-spatial generator layers; elsewhere XLA's conv emitter
    wins.  Updated from scripts/bench_pallas.py measurements."""
    b, h, w, cin = x_shape
    return h * w <= 16 and cin >= 1024 and co % 128 == 0


def use_deconv(x_shape, co: int) -> bool:
    """Dispatch predicate for the generator up-block deconv kernel."""
    if jax.default_backend() != "tpu":
        return False
    mode = _MODE.get()
    if mode == "auto":
        return _deconv_wins(x_shape, co)
    return mode == "on"


def use_join() -> bool:
    """Dispatch predicate for the conditioning-join kernel (measured: tie in
    the train step — auto keeps XLA; force with mode 'on')."""
    return pallas_enabled()


def use_bn_act() -> bool:
    """Dispatch predicate for routing training-graph batch-norm epilogues
    (normalize-affine + activation) through the bn_act kernel.  Measured
    (BASELINE.md round-3 bn_act A/B, `scripts/bench_bn_act.py`): a TIE on
    both full training graphs — GAN-CLS 64px 8.35 vs 8.33 ms/step, Stage-II
    256px 117.3 vs 117.2 ms/step — XLA already fuses the elementwise BN
    epilogue into neighbouring ops, so the kernel has nothing left to save;
    auto keeps XLA (simpler graph, no custom-VJP boundary), force with mode
    'on'.  The inference path never needs this kernel: eval-mode BN folds
    into the conv epilogue entirely (models/gancls.py::folded_deconv)."""
    return pallas_enabled()


def _upconv_wins(x_shape, co: int, bn_follows: bool = False) -> bool:
    """Shapes where the fused upsample+conv3x3 beats XLA on v5e (BASELINE.md
    round-2/3/4 tables).

    TRAINING graphs split on what CONSUMES the conv output (round-4 A/Bs
    with the parity-adjoint backward):

    * ``bn_follows=True`` (StackGAN up-blocks — a train-mode BatchNorm reads
      the raw conv output): ALWAYS lax.  The custom-VJP boundary breaks
      XLA's joint conv+BN-stats fusion and costs more than the kernel saves
      even though the kernel now wins every deep shape standalone fwd+bwd
      (Stage-II 256px end-to-end: off 117.0 ms < auto 119.2 < targeted
      122.3 < wide 136.2).
    * BN-free (PGGAN: activation fused into the kernel): the deep ≤16×16
      layers (round-2 win, round-4 tie-or-better; stage 6/7 auto vs off
      within +1%).

    INFERENCE (forward-only) traces get the wider table where the
    standalone forward wins apply directly: whole-image blocks to 32×32
    (−10…−31%) and the halo-tiled row kernel for ≥64×64 maps whose channels
    need no lane padding (−45% at 64×64×128→64, −47% at 64×64×512→256); XLA
    keeps thin-channel large maps (padding doubles the MACs: +37% at
    128×128×64→32)."""
    b, h, w, cin = x_shape
    if _TRAINING.get():
        if bn_follows:
            return False
        return h * w <= 256 and cin % 128 == 0 and co % 128 == 0
    if h * w <= 1024:
        # 32×32×128→128 measured a tie (0.600 vs 0.597 ms) — XLA keeps it;
        # the 32×32 wins need cin ≥ 256 (more MXU work per loaded byte)
        return (cin % 128 == 0 and co % 128 == 0
                and (h * w <= 256 or cin >= 256))
    return cin % 128 == 0 and co % 64 == 0


def use_upconv(x_shape, co: int, bn_follows: bool = False) -> bool:
    """Dispatch predicate for the generator upsample+conv up-block kernel."""
    if jax.default_backend() != "tpu":
        return False
    mode = _MODE.get()
    if mode == "auto":
        return _upconv_wins(x_shape, co, bn_follows)
    return mode == "on"


def _upconv_s2d_wins(x_shape, co: int, bn_follows: bool = False) -> bool:
    """Shapes where the space-to-depth LAX formulation of the up-block
    (conv.upconv3x3_s2d: depth_to_space ∘ conv3x3(x, W'), no 4x-upsampled
    intermediate, 4co-channel contraction) beats BOTH plain lax and the
    Pallas kernels on v5e (round-5 measurements, BASELINE.md).

    TRAINING: NEVER — measured end-to-end losses in BOTH flagship training
    graphs despite standalone fwd+bwd microbench wins of −45…−68% at the
    thin shapes (Stage-II 256px: s2d 136.7 vs off 117.0 ms; PGGAN stage-7:
    632.4 vs 593.0 ms — `runs/r5/s2d_traingraph.log`).  The depth_to_space
    transpose is a materialization boundary XLA cannot fuse through, and in
    a training graph it severs the joint fwd+bwd fusions (conv+BN-stats /
    conv+pixel_norm) that make the plain composition fast — the same lesson
    the Pallas custom-VJP boundary taught in round 4, now measured for a
    pure-lax rewrite too.

    INFERENCE: ALSO NEVER — the standalone fwd microbench wins are large
    (128×128×64→32: 6.38→1.90 ms, −70%; 64×64×128→64: 0.997 vs halo 1.192)
    but the serving-graph A/B reverses them wholesale: the PGGAN 256px
    generator forward got SLOWER at every batch (B32 34.5→39.6 ms, B512
    537.7→802.9 ms — `runs/r5/serve_sweep_s2d.json` vs `serve_sweep.json`).
    In isolation the op is measured against nothing downstream; in the
    graph the naive up+conv composition fuses with its producer/consumer
    while the s2d transpose materializes (and pays 36/36 MACs vs the
    composition's effective cost after fusion).  The formulation, its
    equivalence/gradient tests, and the bench modes stay in the tree as
    the documented negative — the dispatch table ships what the graphs
    measured: nothing."""
    return False


def use_upconv_s2d(x_shape, co: int, bn_follows: bool = False) -> bool:
    """Dispatch predicate for the space-to-depth lax up-block formulation.
    Call sites check `use_upconv` FIRST (Pallas keeps its measured wins);
    mode 'off' forces the plain lax composition everywhere (the A/B
    baseline), 'on' forces the Pallas kernels — s2d participates only in
    'auto', where every routing is measurement-backed."""
    if jax.default_backend() != "tpu":
        return False
    if _MODE.get() != "auto":
        return False
    return _upconv_s2d_wins(x_shape, co, bn_follows)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_ACTS = {
    "none": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0),
    "lrelu": lambda x: jnp.where(x >= 0, x, 0.2 * x),
    "tanh": jnp.tanh,
}


def _act_grad_from_output(act: str, y: jax.Array) -> jax.Array:
    """d act(p)/dp recovered from y = act(p) — valid because all four
    activations are monotone with sign(y) = sign(p)."""
    y32 = y.astype(jnp.float32)
    if act == "none":
        return jnp.ones_like(y32)
    if act == "relu":
        return (y32 > 0).astype(jnp.float32)
    if act == "lrelu":
        return jnp.where(y32 >= 0, 1.0, 0.2)
    if act == "tanh":
        return 1.0 - y32 * y32
    raise ValueError(act)


# =============================== bn_act ======================================

def _bn_act_kernel(x_ref, a_ref, b_ref, o_ref, *, act):
    y = x_ref[:].astype(jnp.float32) * a_ref[:] + b_ref[:]
    o_ref[:] = _ACTS[act](y).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_act_core(xf, a2, b2, act: str, row_tile: int):
    rows, c = xf.shape
    return pl.pallas_call(
        functools.partial(_bn_act_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((rows, c), xf.dtype),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(xf, a2, b2)


def _bn_act_fwd(xf, a2, b2, act, row_tile):
    y = _bn_act_core(xf, a2, b2, act, row_tile)
    return y, (xf, a2, y)


def _bn_act_bwd(act, row_tile, res, g):
    xf, a2, y = res
    ga = g.astype(jnp.float32) * _act_grad_from_output(act, y)
    dx = (ga * a2).astype(xf.dtype)
    da = jnp.sum(ga * xf.astype(jnp.float32), axis=0, keepdims=True)
    db = jnp.sum(ga, axis=0, keepdims=True)
    return dx, da, db


_bn_act_core.defvjp(_bn_act_fwd, _bn_act_bwd)


def bn_act(x: jax.Array, a: jax.Array, b: jax.Array, act: str = "relu",
           row_tile: int = 256) -> jax.Array:
    """``act(x * a + b)`` over NHWC x with per-channel a,b — one HBM read +
    one write.  Fold BN as a = γ·rsqrt(var+eps), b = β − mean·a.
    Falls back to the plain jnp composition when shapes don't tile."""
    bsz, h, w, c = x.shape
    rows = bsz * h * w
    if rows % row_tile != 0 or c % 128 != 0 or not use_bn_act():
        y = x.astype(jnp.float32) * a.astype(jnp.float32) + b.astype(jnp.float32)
        return _ACTS[act](y).astype(x.dtype)
    y = _bn_act_core(x.reshape(rows, c),
                     a.reshape(1, c).astype(jnp.float32),
                     b.reshape(1, c).astype(jnp.float32), act, row_tile)
    return y.reshape(bsz, h, w, c)


# ========================== conditioning join =================================

def _join_kernel(x_ref, t_ref, wx_ref, wt_ref, b_ref, o_ref, *, act):
    x = x_ref[0]                                   # [HW, Cx]
    t = t_ref[0]                                   # [1, E] (this example)
    y = jnp.dot(x, wx_ref[:], preferred_element_type=jnp.float32)
    y = y + jnp.dot(t, wt_ref[:], preferred_element_type=jnp.float32)
    y = y + b_ref[:]
    o_ref[0] = _ACTS[act](y).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _join_core(xf, t, wx, wt, b2, act: str):
    bsz, hw, cx = xf.shape
    e = t.shape[-1]
    co = wx.shape[-1]
    # t as [B,1,E] so the block's trailing dims equal the array dims
    # (Mosaic requires trailing block dims divisible by (8,128) or full)
    t3 = t.reshape(bsz, 1, e)
    return pl.pallas_call(
        functools.partial(_join_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, co), xf.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, cx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cx, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, co), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hw * cx * co + 2 * bsz * e * co,
            bytes_accessed=(xf.size + t.size + wx.size + wt.size + b2.size
                            + bsz * hw * co) * xf.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, t3, wx, wt, b2)


def _join_fwd(xf, t, wx, wt, b2, act):
    y = _join_core(xf, t, wx, wt, b2, act)
    return y, (xf, t, wx, wt, y)


def _join_bwd(act, res, g):
    xf, t, wx, wt, y = res
    ga = g.astype(jnp.float32) * _act_grad_from_output(act, y)  # [B,HW,Co]
    ga_c = ga.astype(xf.dtype)
    dx = jnp.einsum("bho,co->bhc", ga_c, wx.astype(xf.dtype))
    ga_sum = jnp.sum(ga, axis=1)                                # [B,Co]
    dt = (ga_sum.astype(t.dtype) @ wt.T.astype(t.dtype))
    dwx = jnp.einsum("bhc,bho->co", xf, ga_c).astype(wx.dtype)
    dwt = (t.T @ ga_sum.astype(t.dtype)).astype(wt.dtype)
    db = jnp.sum(ga, axis=(0, 1), keepdims=True).reshape(1, -1)
    return dx, dt, dwx, dwt, db.astype(jnp.float32)


_join_core.defvjp(_join_fwd, _join_bwd)


def conditioning_join(x: jax.Array, t: jax.Array, wx: jax.Array,
                      wt: jax.Array, bias: jax.Array, act: str = "none"
                      ) -> jax.Array:
    """Fused ``act(conv1x1(concat(x, tile(t))))``.

    x[B,H,W,Cx], t[B,E] → y[B,H,W,Co] = act(x·wx + t·wt + bias), where
    (wx; wt) is the vertical split of the reference 1×1 conv kernel over the
    [image-channels; text-channels] concat axis.  The [B,H,W,Cx+E] concat and
    the tiled-text tensor are never materialized.
    """
    bsz, h, w, cx = x.shape
    co = wx.shape[-1]
    xf = x.reshape(bsz, h * w, cx)
    y = _join_core(
        xf, t.astype(x.dtype),
        wx.reshape(cx, co).astype(x.dtype),
        wt.reshape(-1, co).astype(x.dtype),
        bias.reshape(1, co).astype(jnp.float32), act)
    return y.reshape(bsz, h, w, co)
