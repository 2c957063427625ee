"""Pallas fused-kernel equivalence tests (SURVEY.md §4: Pallas kernels vs
jax.lax reference impls, forward AND backward).  On CPU the kernels run in
interpret mode; the same code compiles via Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.ops import layers as L
from text_to_image_tpu.ops.pallas import fused

KEY = jax.random.PRNGKey(0)


def _ref_bn_act(x, a, b, act):
    y = x.astype(jnp.float32) * a + b
    return fused._ACTS[act](y).astype(x.dtype)


@pytest.mark.parametrize("act", ["none", "relu", "lrelu", "tanh"])
def test_bn_act_forward_matches(act):
    x = jax.random.normal(KEY, (8, 8, 8, 128))
    a = jax.random.normal(jax.random.fold_in(KEY, 1), (128,)) + 1.0
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (128,))
    got = fused._bn_act_core(x.reshape(-1, 128),
                             a.reshape(1, -1), b.reshape(1, -1), act, 128)
    ref = _ref_bn_act(x, a, b, act).reshape(-1, 128)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_bn_act_gradients_match():
    x = jax.random.normal(KEY, (4, 4, 8, 128))
    a = jax.random.normal(jax.random.fold_in(KEY, 1), (1, 128)) + 1.0
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (1, 128))
    ct = jax.random.normal(jax.random.fold_in(KEY, 3), (4 * 4 * 8, 128))

    def loss_pallas(x, a, b):
        y = fused._bn_act_core(x.reshape(-1, 128), a, b, "lrelu", 128)
        return jnp.sum(y * ct)

    def loss_ref(x, a, b):
        y = _ref_bn_act(x, a.reshape(-1), b.reshape(-1), "lrelu")
        return jnp.sum(y.reshape(-1, 128) * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a, b)
    for p, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(p).ravel(),
                                   np.asarray(r).ravel(), rtol=1e-4, atol=1e-5)


def test_bn_act_public_fallback_on_cpu():
    """Off-TPU the public wrapper must use the jnp path and still be right."""
    x = jax.random.normal(KEY, (2, 3, 3, 5))  # untileable shape on purpose
    a = jnp.ones((5,)) * 2.0
    b = jnp.zeros((5,))
    np.testing.assert_allclose(fused.bn_act(x, a, b, "relu"),
                               jnp.maximum(x * 2.0, 0), rtol=1e-6)


def _ref_join(x, t, w, bias, act):
    y = L.conv2d({"w": w, "b": bias}, L.tile_and_concat(x, t), stride=1)
    return fused._ACTS[act](y)


@pytest.mark.parametrize("act", ["none", "lrelu"])
def test_join_forward_matches_concat_conv(act):
    b, h, w_, cx, e, co = 4, 4, 4, 128, 128, 256
    x = jax.random.normal(KEY, (b, h, w_, cx))
    t = jax.random.normal(jax.random.fold_in(KEY, 1), (b, e))
    wconv = jax.random.normal(jax.random.fold_in(KEY, 2),
                              (1, 1, cx + e, co)) * 0.05
    bias = jax.random.normal(jax.random.fold_in(KEY, 3), (co,)) * 0.1

    got = fused.conditioning_join(x, t, wconv[0, 0, :cx], wconv[0, 0, cx:],
                                  bias, act)
    ref = _ref_join(x, t, wconv, bias, act)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_join_gradients_match():
    b, h, w_, cx, e, co = 2, 4, 4, 128, 128, 128
    x = jax.random.normal(KEY, (b, h, w_, cx))
    t = jax.random.normal(jax.random.fold_in(KEY, 1), (b, e))
    wconv = jax.random.normal(jax.random.fold_in(KEY, 2),
                              (1, 1, cx + e, co)) * 0.05
    bias = jnp.zeros((co,))
    ct = jax.random.normal(jax.random.fold_in(KEY, 3), (b, h, w_, co))

    def loss_pallas(x, t, w, bias):
        y = fused.conditioning_join(x, t, w[0, 0, :cx], w[0, 0, cx:], bias,
                                    "lrelu")
        return jnp.sum(y * ct)

    def loss_ref(x, t, w, bias):
        return jnp.sum(_ref_join(x, t, w, bias, "lrelu") * ct)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, t, wconv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, t, wconv, bias)
    for name, p, r in zip(("x", "t", "w", "bias"), gp, gr):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


def test_join_under_vmap():
    """The 3-stream discriminator vmaps over the join."""
    s, b, h, w_, cx, e, co = 3, 2, 4, 4, 128, 128, 128
    xs = jax.random.normal(KEY, (s, b, h, w_, cx))
    ts = jax.random.normal(jax.random.fold_in(KEY, 1), (s, b, e))
    wconv = jax.random.normal(jax.random.fold_in(KEY, 2),
                              (1, 1, cx + e, co)) * 0.05
    bias = jnp.zeros((co,))

    def one(x, t):
        return fused.conditioning_join(x, t, wconv[0, 0, :cx],
                                       wconv[0, 0, cx:], bias, "none")

    got = jax.vmap(one)(xs, ts)
    for i in range(s):
        np.testing.assert_allclose(got[i], _ref_join(xs[i], ts[i], wconv,
                                                     bias, "none"),
                                   rtol=2e-5, atol=2e-5)


def test_discriminator_same_with_and_without_pallas():
    """Model-level check: D logits identical under the fused-join code path
    (forced, interpret mode) and the lax composition."""
    from text_to_image_tpu.models import gancls
    from tests.helpers import tiny_config
    cfg = tiny_config("gancls")
    dp, ds = gancls.discriminator_init(KEY, cfg.gan, cfg.data.image_size,
                                       norm="batch")
    x = jax.random.uniform(KEY, (4, 16, 16, 3), minval=-1, maxval=1)
    emb = jax.random.normal(jax.random.fold_in(KEY, 1), (4, cfg.gan.embed_dim))

    ref, _ = gancls.discriminator_apply(dp, ds, x, emb, True, L.FP32, 16)
    orig = fused.pallas_enabled
    fused.pallas_enabled = lambda: True  # force the kernel path (interpret)
    try:
        got, _ = gancls.discriminator_apply(dp, ds, x, emb, True, L.FP32, 16)
    finally:
        fused.pallas_enabled = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_upconv_dispatch_splits_on_trace_intent():
    """The auto-dispatch win table differs between training graphs and
    forward-only traces (BASELINE.md round-3: large-map kernels win
    standalone/inference but lose in training graphs through the custom-VJP
    fusion break).  `fused.inference()` flips the contextvar the predicate
    reads at trace time."""
    wins = fused._upconv_wins

    # deep small maps win everywhere
    assert wins((64, 8, 8, 512), 256)
    with fused.inference():
        assert wins((64, 8, 8, 512), 256)

    # 32x32x256->128: inference-only win (-33% standalone)
    assert not wins((64, 32, 32, 256), 128)
    with fused.inference():
        assert wins((64, 32, 32, 256), 128)

    # 32x32x128->128 measured a tie: XLA keeps it in both modes
    with fused.inference():
        assert not wins((64, 32, 32, 128), 128)

    # halo shapes: inference-only, lane-aligned channels required
    assert not wins((64, 64, 64, 128), 64)
    with fused.inference():
        assert wins((64, 64, 64, 128), 64)        # -45% measured
        assert wins((64, 64, 64, 512), 256)       # -47% measured
        assert not wins((64, 128, 128, 64), 32)   # +37% (thin-channel pad)

    # the context restores on exit
    assert not wins((64, 64, 64, 128), 64)


def test_upconv_thin_channel_padding_matches_lax():
    """Halo kernel with channels below lane alignment zero-pads cin/co
    (`conv._halo_padded_dims`); numerics must be exact vs lax."""
    from text_to_image_tpu.ops.pallas import conv as K

    x = jax.random.normal(KEY, (1, 40, 40, 24))          # h*w>1024, thin cin
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 24, 12)) * 0.1
    s = jax.random.normal(jax.random.fold_in(KEY, 2), (12,)) * 0.3 + 1.0
    t = jax.random.normal(jax.random.fold_in(KEY, 3), (12,)) * 0.2
    got = K.upconv3x3(x, w, s, t, "relu")
    s2 = s.reshape(1, -1).astype(jnp.float32)
    t2 = t.reshape(1, -1).astype(jnp.float32)
    ref = K._lax_upconv(x, w, s2, t2, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_batch_norm_act_composite_matches_batch_norm():
    """L.batch_norm_act default path must be bit-identical to batch_norm +
    activation (dispatch off everywhere except forced-on TPU), and the
    forced affine refactoring must agree numerically in both train modes."""
    p, s = L.batch_norm_init(128, KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 7), (4, 8, 8, 128))
    for train in (True, False):
        for act in ("relu", "lrelu"):
            y, ns = L.batch_norm_act(p, s, x, train, act=act)
            y_ref, ns_ref = L.batch_norm(p, s, x, train)
            y_ref = L._BN_ACTS[act](y_ref)
            np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
            for k in ns:
                np.testing.assert_array_equal(np.asarray(ns[k]),
                                              np.asarray(ns_ref[k]))


def test_batch_norm_act_affine_fold_equivalent():
    """The act(x·a + b) refactoring used by the fused path equals the plain
    normalize-then-affine composition to fp tolerance."""
    p, s = L.batch_norm_init(128, KEY)
    s = {"mean": jax.random.normal(KEY, (128,)),
         "var": jax.random.uniform(KEY, (128,), minval=0.5, maxval=2.0)}
    x = jax.random.normal(jax.random.fold_in(KEY, 9), (4, 8, 8, 128))
    eps = 1e-5
    a = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    b = p["bias"] - s["mean"] * a
    got = fused.bn_act(x, a, b, "relu")
    ref, _ = L.batch_norm(p, s, x, train=False)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jax.nn.relu(ref)),
                               rtol=1e-5, atol=1e-5)
