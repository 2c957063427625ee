"""Pallas-vs-XLA per-shape measurement harness (BASELINE.md "Pallas vs XLA").

Times each owned kernel against its XLA (lax) equivalent on the flagship GAN
shapes, for each staging variant, and prints a markdown table plus a
suggested dispatch verdict per shape.  Run on a real TPU:

    python scripts/bench_pallas.py            # kernel microbench
    python scripts/bench_pallas.py --train    # full-train-step A/B
    python scripts/bench_pallas.py --eval     # eval-mode generator A/B

The winners feed the auto-dispatch table in ops/pallas/fused.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # scalar fetch = hard sync; block_until_ready does NOT block on
    # tunneled dev TPUs (BASELINE.md round-1 note)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=200, warmup=1):
    """Per-iteration device time of fn(*args): `iters` executions chained
    inside ONE compiled scan (serialized by a tiny additive dependency on the
    first operand), so per-call dispatch / tunnel RTT cannot put a floor
    under sub-millisecond kernels."""
    from jax import lax

    x0, consts = args[0], args[1:]

    @jax.jit
    def chain(x):
        def body(c, _):
            y = fn(c, *consts)
            # full-output reduction scaled to numerical irrelevance: keeps a
            # true data dependency without perturbing the operand
            c = c + (1e-30 * jnp.mean(y)).astype(c.dtype)
            return c, ()
        c, _ = lax.scan(body, x, None, length=iters)
        return c

    for _ in range(warmup + 1):
        out = chain(x0)
    _sync(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x0)
        _sync(out)
        times.append((time.perf_counter() - t0) / iters * 1e3)  # ms
    return sorted(times)[1]


def bench_deconv(shapes, dtype=jnp.bfloat16):
    from text_to_image_tpu.ops.pallas import conv as pconv
    from text_to_image_tpu.ops.pallas import fused

    rows = []
    for (b, h, w, cin, co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        wt = jax.random.normal(key, (5, 5, cin, co), jnp.float32)
        s = jnp.ones((co,), jnp.float32)
        t = jnp.zeros((co,), jnp.float32)

        def xla(x, wt, s, t):
            return pconv._lax_deconv(x, wt, s, t, "relu")

        def pallas_stage(stage, x, wt, s, t):
            pconv._DECONV_STAGING = stage
            with fused.use_pallas(True):
                return pconv.deconv5x5_s2(x, wt, s, t, "relu")

        t_xla = timeit(jax.jit(xla), x, wt, s, t)
        t_vm = t_hb = float("nan")
        try:
            t_vm = timeit(jax.jit(functools.partial(pallas_stage, "vmem")),
                          x, wt, s, t)
        except Exception as e:
            print(f"  vmem variant failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        try:
            t_hb = timeit(jax.jit(functools.partial(pallas_stage, "hbm")),
                          x, wt, s, t)
        except Exception as e:
            print(f"  hbm variant failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        best = min(t_vm, t_hb)
        rows.append((f"deconv B{b} {h}x{w}x{cin}->{co}", t_xla, t_vm, t_hb,
                     "PALLAS" if best < t_xla * 0.98 else
                     ("tie" if best < t_xla * 1.02 else "XLA")))
    return rows


def bench_conv(shapes, dtype=jnp.bfloat16):
    from text_to_image_tpu.ops.pallas import conv as pconv
    from text_to_image_tpu.ops.pallas import fused

    rows = []
    for (b, h, w, cin, co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        wt = jax.random.normal(key, (5, 5, cin, co), jnp.float32)
        bias = jnp.zeros((co,), jnp.float32)

        def xla(x, wt, bias):
            return pconv._lax_conv_s2(x, wt, bias, "lrelu")

        def pallas_stage(stage, x, wt, bias):
            pconv._CONV_STAGING = stage
            with fused.use_pallas(True):
                return pconv.conv5x5_s2_act(x, wt, bias, "lrelu")

        t_xla = timeit(jax.jit(xla), x, wt, bias)
        t_vm = t_hb = float("nan")
        try:
            t_vm = timeit(jax.jit(functools.partial(pallas_stage, "vmem")),
                          x, wt, bias)
        except Exception as e:
            print(f"  vmem variant failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        try:
            t_hb = timeit(jax.jit(functools.partial(pallas_stage, "hbm")),
                          x, wt, bias)
        except Exception as e:
            print(f"  hbm variant failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        best = min(t_vm, t_hb)
        rows.append((f"conv B{b} {h}x{w}x{cin}->{co}", t_xla, t_vm, t_hb,
                     "PALLAS" if best < t_xla * 0.98 else
                     ("tie" if best < t_xla * 1.02 else "XLA")))
    return rows


def bench_upconv(shapes, dtype=jnp.bfloat16):
    from text_to_image_tpu.ops.pallas import conv as pconv

    rows = []
    for (b, h, w, cin, co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        wt = jax.random.normal(key, (3, 3, cin, co), jnp.float32)
        s = jnp.ones((co,), jnp.float32)
        t = jnp.zeros((co,), jnp.float32)

        def xla(x, wt, s, t):
            return pconv._lax_upconv(x, wt, s, t, "relu")

        def pallas(x, wt, s, t):
            return pconv._upconv_op(x, wt, s, t, "relu")

        def s2d(x, wt, s, t):
            return pconv.upconv3x3_s2d(x, wt, s, t, "relu")

        t_xla = timeit(jax.jit(xla), x, wt, s, t)
        t_pal = float("nan")
        try:
            t_pal = timeit(jax.jit(pallas), x, wt, s, t)
        except Exception as e:
            print(f"  upconv pallas failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        t_s2d = timeit(jax.jit(s2d), x, wt, s, t)
        best = min(t_xla, t_s2d, t_pal if t_pal == t_pal else t_xla)
        verdict = ("PALLAS" if best == t_pal else
                   "S2D" if best == t_s2d else "XLA")
        if abs(t_s2d - t_xla) < 0.02 * t_xla and verdict != "PALLAS":
            verdict = "tie(xla/s2d)"
        rows.append((f"upconv B{b} {h}x{w}x{cin}->{co}", t_xla, t_pal,
                     t_s2d, verdict))
    return rows


def bench_upconv_grad(shapes, dtype=jnp.bfloat16):
    """Fwd+bwd A/B of the fused up-block (the round-3 snapshot commit cut
    the backward to parity-decomposed adjoints — 32/144 of the lax-adjoint
    MACs, no upsampled intermediates in HBM; this measures that claim)."""
    from text_to_image_tpu.ops.pallas import conv as pconv

    rows = []
    for (b, h, w, cin, co) in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        wt = jax.random.normal(key, (3, 3, cin, co), jnp.float32)
        s = jnp.ones((co,), jnp.float32)
        t = jnp.zeros((co,), jnp.float32)

        def fwd_bwd(op):
            def loss(x, wt):
                y = op(x, wt, s, t, "relu")
                return jnp.sum(y.astype(jnp.float32) ** 2)

            def run(x, wt):
                dx, dw = jax.grad(loss, argnums=(0, 1))(x, wt)
                # single array out for the timing chain's data dependency
                return dx + jnp.mean(dw).astype(dx.dtype)

            return run

        t_xla = timeit(jax.jit(fwd_bwd(pconv._lax_upconv)), x, wt)
        t_pal = float("nan")
        try:
            t_pal = timeit(jax.jit(fwd_bwd(pconv._upconv_op)), x, wt)
        except Exception as e:
            print(f"  upconv grad pallas failed for {(b,h,w,cin,co)}: {e}",
                  file=sys.stderr)
        t_s2d = timeit(jax.jit(fwd_bwd(pconv.upconv3x3_s2d)), x, wt)
        best = min(t_xla, t_s2d, t_pal if t_pal == t_pal else t_xla)
        verdict = ("PALLAS" if best == t_pal else
                   "S2D" if best == t_s2d else "XLA")
        if abs(t_s2d - t_xla) < 0.02 * t_xla and verdict != "PALLAS":
            verdict = "tie(xla/s2d)"
        rows.append((f"upconv fwd+bwd B{b} {h}x{w}x{cin}->{co}", t_xla, t_pal,
                     t_s2d, verdict))
    return rows


def bench_train_graph(which: str, batch=64):
    """Full-train-step A/B on the up-block-heavy graphs (Stage-II 256px,
    PGGAN stages 6/7): pallas off vs the training dispatch table vs the
    wide (inference) table forced into the training trace.  This is the
    measurement that decides `_upconv_wins`'s training branch."""
    from text_to_image_tpu.config import (Config, CoeffConfig, DataConfig,
                                          PgganConfig, TrainConfig)
    from text_to_image_tpu.ops.pallas import fused
    from text_to_image_tpu.train.steps import (_make_step_body,
                                               init_train_state)
    from text_to_image_tpu.utils import prng

    if which == "stackgan_stage2":
        cfg = Config(model="stackgan_stage2",
                     train=TrainConfig(batch_size=batch, g_steps=1),
                     data=DataConfig(dataset_name="synthetic", image_size=256),
                     dtype="bfloat16")
    else:
        stage = int(which.removeprefix("pggan"))
        cfg = Config(model="pggan",
                     train=TrainConfig(batch_size=batch, n_critic=2, g_steps=1,
                                       beta1=0.0,
                                       coeff=CoeffConfig(drift_epsilon=1e-3)),
                     data=DataConfig(dataset_name="synthetic", image_size=256),
                     pggan=PgganConfig(stage=stage, start_step=0),
                     dtype="bfloat16")
    res = 256
    k = cfg.train.n_critic
    rng = np.random.default_rng(0)
    batch_d = jax.device_put({
        "real": rng.integers(0, 256, (k, batch, res, res, 3), dtype=np.uint8),
        "wrong": rng.integers(0, 256, (k, batch, res, res, 3), dtype=np.uint8),
        "emb": rng.normal(size=(k, batch, cfg.gan.embed_dim)).astype(np.float32),
    })
    def targeted_wins(x_shape, co, bn_follows=False):
        # bn_follows is accepted (use_upconv passes it) and DELIBERATELY
        # ignored: targeted mode measures routing the fwd+bwd winners even
        # into BN-followed up-blocks — the whole point of the A/B.
        # fwd+bwd-informed training table (round-4 --grad microbench): only
        # the shapes whose full fwd+bwd beat lax standalone — whole-image to
        # 32x32 with cin >= 256 (16x16x256->128 -20%, 32x32x256->128 -11%)
        # and the halo kernel for wide-channel large maps (64x64x512->256
        # -30%); the measured fwd+bwd losers (64x64x128->64 +70%,
        # 128x128x64->32 +87%) stay on lax
        b, h, w, cin = x_shape
        if h * w <= 1024:
            return cin >= 256 and cin % 128 == 0 and co % 128 == 0
        return cin >= 512 and cin % 128 == 0 and co % 128 == 0

    def s2d_hypothesis(x_shape, co, bn_follows=False):
        # route EVERY up-block >= 32x32 through the space-to-depth lax
        # formulation (pure lax — the custom-VJP boundary objection does not
        # apply, so bn_follows is deliberately ignored); the measured
        # verdict lands in fused._upconv_s2d_wins
        b, h, w, cin = x_shape
        return h * w >= 1024

    body = _make_step_body(cfg.compute_key(), 100)
    rows = []
    import unittest.mock
    for mode in ("off", "auto", "wide", "targeted", "s2d"):
        step = jax.jit(lambda ts, b: body(ts, b), donate_argnums=0)
        if mode == "wide":
            ctx = fused.inference()
        elif mode == "targeted":
            ctx = unittest.mock.patch.object(fused, "_upconv_wins",
                                             targeted_wins)
        elif mode == "s2d":
            ctx = unittest.mock.patch.object(fused, "_upconv_s2d_wins",
                                             s2d_hypothesis)
        else:
            ctx = contextlib.nullcontext()
        with fused.use_pallas("off" if mode == "off" else "auto"), ctx:
            ts = init_train_state(prng.base_key(0), cfg, 100)
            for _ in range(5):
                ts, m = step(ts, batch_d)
            float(m["g_loss"])
            t0 = time.perf_counter()
            for _ in range(100):
                ts, m = step(ts, batch_d)
            float(m["g_loss"])
        dt = (time.perf_counter() - t0) / 100 * 1e3
        rows.append((f"{which} B{batch} train step, upconv dispatch={mode}",
                     dt))
        del ts
    return rows


def bench_eval_generator(batch=256):
    from text_to_image_tpu.config import GanConfig
    from text_to_image_tpu.models import gancls
    from text_to_image_tpu.ops import layers as L
    from text_to_image_tpu.ops.pallas import fused

    gan = GanConfig()
    params, state = gancls.generator_init(jax.random.PRNGKey(0), gan, 64)
    pol = L.Policy.from_str("bfloat16")
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, gan.z_dim))
    emb = jax.random.normal(jax.random.PRNGKey(2), (batch, gan.embed_dim))

    def xla_gen(z, params, state, emb):
        return gancls.generator_apply(params, state, z, emb, False, pol, 64)[0]

    def pallas_gen(z, params, state, emb):
        # "auto": BN-folded inference path with per-shape kernel dispatch
        with fused.use_pallas("auto"):
            return gancls.generator_apply_inference(params, state, z, emb,
                                                    pol, 64)

    t_xla = timeit(jax.jit(xla_gen), z, params, state, emb)
    t_pal = timeit(jax.jit(pallas_gen), z, params, state, emb)
    return [(f"eval generator B{batch} (BN folded)", t_xla, t_pal,
             float("nan"),
             "PALLAS" if t_pal < t_xla * 0.98 else
             ("tie" if t_pal < t_xla * 1.02 else "XLA"))]


def bench_train_step(batch=64):
    from text_to_image_tpu.config import Config, DataConfig, TrainConfig
    from text_to_image_tpu.train.steps import init_train_state, make_train_step
    from text_to_image_tpu.utils import prng

    cfg = Config(model="gancls",
                 train=TrainConfig(batch_size=batch, g_steps=2),
                 data=DataConfig(dataset_name="synthetic", image_size=64),
                 dtype="bfloat16")
    rng = np.random.default_rng(0)
    batch_d = {
        "real": jnp.asarray(rng.integers(0, 256, (1, batch, 64, 64, 3),
                                         dtype=np.uint8)),
        "wrong": jnp.asarray(rng.integers(0, 256, (1, batch, 64, 64, 3),
                                          dtype=np.uint8)),
        "emb": jnp.asarray(rng.normal(size=(1, batch, 1024)).astype(np.float32)),
    }
    rows = []
    for mode in ("off", "auto", "on"):
        cfg_m = cfg.replace(use_pallas=mode)
        ts = init_train_state(prng.base_key(0), cfg_m, 100)
        step = make_train_step(cfg_m, 100)
        for _ in range(5):
            ts, m = step(ts, batch_d)
        float(m["g_loss"])
        t0 = time.perf_counter()
        for _ in range(100):
            ts, m = step(ts, batch_d)
        float(m["g_loss"])
        dt = (time.perf_counter() - t0) / 100 * 1e3
        rows.append((f"train step B{batch} pallas={mode}", dt))
    return rows


def show(rows):
    print(f"\n| workload | XLA ms | Pallas | alt (hbm-staged / s2d-lax) | winner |")
    print("|---|---|---|---|---|")
    for name, t_xla, t_vm, t_hb, verdict in rows:
        print(f"| {name} | {t_xla:.3f} | {t_vm:.3f} | {t_hb:.3f} | {verdict} |")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--upconv", action="store_true",
                   help="only the upsample+conv3x3 table (incl. halo shapes)")
    p.add_argument("--grad", action="store_true",
                   help="with --upconv: time fwd+bwd instead of forward-only")
    p.add_argument("--train-graph", default=None,
                   choices=("stackgan_stage2", "pggan6", "pggan7"),
                   help="full-train-step A/B: off vs training table vs wide "
                        "(inference) dispatch table")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    if args.train_graph:
        for name, dt in bench_train_graph(args.train_graph, args.batch):
            print(f"{name}: {dt:.3f} ms")
    elif args.train:
        for name, dt in bench_train_step(args.batch):
            print(f"{name}: {dt:.3f} ms")
    elif args.eval:
        show(bench_eval_generator())
    elif args.upconv and args.grad:
        b = args.batch
        show(bench_upconv_grad([
            (b, 16, 16, 256, 128),
            (b, 32, 32, 256, 128),   # PGGAN s4→5 up
            (b, 64, 64, 128, 64),    # PGGAN s5→6 up / Stage-II up2
            (b, 128, 128, 64, 32),   # PGGAN s6→7 up (256px)
            (b, 64, 64, 512, 256),   # Stage-II 256px widest up-block
        ]))
    elif args.upconv:
        b = args.batch
        show(bench_upconv([
            (b, 16, 16, 256, 128),   # in-VMEM whole-image kernel (r2 winner)
            (b, 32, 32, 128, 128),
            # large-spatial shapes → the halo-tiled row kernel (round 3):
            (b, 32, 32, 256, 128),   # PGGAN s4→5 up
            (b, 64, 64, 128, 64),    # PGGAN s5→6 up / Stage-II up2
            (b, 128, 128, 64, 32),   # PGGAN s6→7 up (256px)
            (b, 64, 64, 512, 256),   # Stage-II 256px widest up-block
        ]))
    else:
        b = args.batch
        show(bench_deconv([
            (b, 4, 4, 1024, 512),
            (b, 8, 8, 512, 256),
            (b, 16, 16, 256, 128),
        ]))
        show(bench_conv([
            (3 * b, 32, 32, 64, 128),
            (3 * b, 16, 16, 128, 256),
            (3 * b, 8, 8, 256, 512),
        ]))
        show(bench_upconv([       # StackGAN/PGGAN generator up-blocks
            (b, 4, 4, 1024, 512),
            (b, 8, 8, 512, 256),
            (b, 16, 16, 256, 128),
            (b, 32, 32, 128, 128),
            # large-spatial shapes → the halo-tiled row kernel (round 3):
            (b, 32, 32, 256, 128),   # PGGAN s4→5 up
            (b, 64, 64, 128, 64),    # PGGAN s5→6 up / Stage-II up2
            (b, 128, 128, 64, 32),   # PGGAN s6→7 up (256px)
            (b, 64, 64, 512, 256),   # Stage-II 256px widest up-block
        ]))
