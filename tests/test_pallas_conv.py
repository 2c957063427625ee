"""Equivalence tests for the Pallas (de)conv kernels vs their lax
compositions — forward and gradients, multiple shapes, vmapped streams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from text_to_image_tpu.ops.pallas import conv as K

KEY = jax.random.PRNGKey(7)
DIMS = ("NHWC", "HWIO", "NHWC")


def _lax_deconv(x, w, s, t, act):
    y = lax.conv_transpose(x, w, (2, 2), "SAME", dimension_numbers=DIMS)
    y = y.astype(jnp.float32) * s + t
    return K._ACTS[act](y).astype(x.dtype)


@pytest.fixture(params=["vmem", "hbm"])
def staging(request, monkeypatch):
    """Both tap-staging variants (in-VMEM pad vs HBM-materialized padded
    view) must stay equivalent — the TPU dispatch picks by measurement."""
    monkeypatch.setattr(K, "_DECONV_STAGING", request.param)
    monkeypatch.setattr(K, "_CONV_STAGING", request.param)
    return request.param


@pytest.mark.parametrize("shape,co", [((2, 4, 4, 16), 8),
                                      ((3, 8, 8, 8), 16),
                                      ((2, 5, 7, 4), 8),   # odd spatial
                                      ((2, 8, 8, 8), 3)])  # RGB output
@pytest.mark.parametrize("act", ["none", "relu", "tanh"])
def test_deconv_forward_matches_lax(shape, co, act, staging):
    cin = shape[-1]
    x = jax.random.normal(KEY, shape)
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (5, 5, cin, co)) * 0.1
    s = jax.random.normal(jax.random.fold_in(KEY, 2), (co,)) * 0.3 + 1.0
    t = jax.random.normal(jax.random.fold_in(KEY, 3), (co,)) * 0.2

    got = K.deconv5x5_s2(x, w, s, t, act)
    ref = _lax_deconv(x, w, s, t, act)
    assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_deconv_gradients_match_lax():
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (5, 5, 8, 8)) * 0.1
    s = jnp.ones((8,))
    t = jnp.zeros((8,))
    ct = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 8, 8, 8))

    def loss_k(x, w, s, t):
        return jnp.sum(K.deconv5x5_s2(x, w, s, t, "relu") * ct)

    def loss_l(x, w, s, t):
        return jnp.sum(_lax_deconv(x, w, s, t, "relu") * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, w, s, t)
    gl = jax.grad(loss_l, argnums=(0, 1, 2, 3))(x, w, s, t)
    for name, a, b in zip("xwst", gk, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


def _lax_conv(x, w, b, act):
    y = lax.conv_general_dilated(x, w, (2, 2), "SAME",
                                 dimension_numbers=DIMS)
    return K._ACTS[act]((y + b).astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape,co", [((2, 8, 8, 3), 8),
                                      ((3, 16, 16, 8), 16),
                                      ((2, 4, 4, 16), 8)])
def test_conv_s2_forward_matches_lax(shape, co, staging):
    cin = shape[-1]
    x = jax.random.normal(KEY, shape)
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (5, 5, cin, co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (co,)) * 0.1

    got = K.conv5x5_s2_act(x, w, b, "lrelu")
    ref = _lax_conv(x, w, b, "lrelu")
    assert got.shape == (shape[0], shape[1] // 2, shape[2] // 2, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_s2_gradients_match_lax():
    x = jax.random.normal(KEY, (2, 8, 8, 4))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (5, 5, 4, 8)) * 0.1
    b = jnp.zeros((8,))
    ct = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 4, 4, 8))

    def loss_k(x, w, b):
        return jnp.sum(K.conv5x5_s2_act(x, w, b, "lrelu") * ct)

    def loss_l(x, w, b):
        return jnp.sum(_lax_conv(x, w, b, "lrelu") * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
    gl = jax.grad(loss_l, argnums=(0, 1, 2))(x, w, b)
    for name, a, b_ in zip("xwb", gk, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


def test_inference_generator_matches_eval_mode():
    """BN-folded fused inference generator ≡ generator_apply(train=False)."""
    from text_to_image_tpu.models import gancls
    from text_to_image_tpu.ops import layers as L
    from tests.helpers import tiny_config

    cfg = tiny_config("gancls")
    gp, gs = gancls.generator_init(KEY, cfg.gan, cfg.data.image_size)
    # make running stats non-trivial
    gs = jax.tree.map(lambda s: s + 0.1 * jnp.arange(s.shape[-1],
                                                     dtype=s.dtype), gs)
    z = jax.random.normal(KEY, (4, cfg.gan.z_dim))
    emb = jax.random.normal(jax.random.fold_in(KEY, 1), (4, cfg.gan.embed_dim))

    ref, _ = gancls.generator_apply(gp, gs, z, emb, train=False,
                                    policy=L.FP32,
                                    resolution=cfg.data.image_size)
    got = gancls.generator_apply_inference(gp, gs, z, emb, L.FP32,
                                           cfg.data.image_size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_conv_s2_under_vmap():
    """3-stream discriminator usage."""
    xs = jax.random.normal(KEY, (3, 2, 8, 8, 4))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (5, 5, 4, 8)) * 0.1
    b = jnp.zeros((8,))
    got = jax.vmap(lambda x: K.conv5x5_s2_act(x, w, b, "lrelu"))(xs)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(_lax_conv(xs[i], w, b, "lrelu")),
                                   rtol=2e-5, atol=2e-5)


def _lax_upconv_ref(x, w, s, t, act):
    b, h, wd, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, wd, 2, c))
    up = up.reshape(b, 2 * h, 2 * wd, c)
    y = lax.conv_general_dilated(up, w, (1, 1), "SAME",
                                 dimension_numbers=DIMS)
    y = y.astype(jnp.float32) * s + t
    return K._ACTS[act](y).astype(x.dtype)


@pytest.mark.parametrize("shape,co", [((2, 4, 4, 16), 8),
                                      ((3, 8, 8, 8), 16),
                                      ((2, 5, 7, 4), 8)])   # odd spatial
@pytest.mark.parametrize("act", ["none", "relu", "tanh"])
def test_upconv_forward_matches_lax(shape, co, act):
    cin = shape[-1]
    x = jax.random.normal(KEY, shape)
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, cin, co)) * 0.1
    s = jax.random.normal(jax.random.fold_in(KEY, 2), (co,)) * 0.3 + 1.0
    t = jax.random.normal(jax.random.fold_in(KEY, 3), (co,)) * 0.2

    got = K.upconv3x3(x, w, s, t, act)
    ref = _lax_upconv_ref(x, w, s, t, act)
    assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upconv_gradients_match_lax():
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 8, 8)) * 0.1
    s = jnp.ones((8,))
    t = jnp.zeros((8,))
    ct = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 8, 8, 8))

    def loss_k(x, w, s, t):
        return jnp.sum(K.upconv3x3(x, w, s, t, "relu") * ct)

    def loss_l(x, w, s, t):
        return jnp.sum(_lax_upconv_ref(x, w, s, t, "relu") * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, w, s, t)
    gl = jax.grad(loss_l, argnums=(0, 1, 2, 3))(x, w, s, t)
    for name, a, b in zip("xwst", gk, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


def test_upconv_bias_matches_and_grads():
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 8, 8)) * 0.1
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (8,)) * 0.1
    ct = jax.random.normal(jax.random.fold_in(KEY, 3), (2, 8, 8, 8))
    ones = jnp.ones((8,))

    for act in ("none", "lrelu", "tanh"):
        got = K.upconv3x3_bias(x, w, b, act)
        ref = _lax_upconv_ref(x, w, ones, b, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=act)

        gk = jax.grad(lambda *a: jnp.sum(K.upconv3x3_bias(*a, act) * ct),
                      argnums=(0, 1, 2))(x, w, b)
        gl = jax.grad(lambda x_, w_, b_: jnp.sum(
            _lax_upconv_ref(x_, w_, ones, b_, act) * ct),
            argnums=(0, 1, 2))(x, w, b)
        for name, a_, b_ in zip("xwb", gk, gl):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{act} grad {name}")


@pytest.mark.parametrize("shape,co", [((2, 36, 36, 16), 8),   # halo-tiled
                                      ((1, 40, 48, 8), 16),   # th from divisors
                                      ((2, 34, 34, 8), 8)])   # no tile → lax fallback
@pytest.mark.parametrize("act", ["none", "relu"])
def test_upconv_halo_forward_matches_lax(shape, co, act):
    """Large-spatial (h*w > 1024) maps take the halo-tiled row kernel: padded
    input stays in HBM, each grid step DMAs a 1-row-halo window into a
    double-buffered scratch."""
    cin = shape[-1]
    x = jax.random.normal(KEY, shape)
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, cin, co)) * 0.1
    s = jax.random.normal(jax.random.fold_in(KEY, 2), (co,)) * 0.3 + 1.0
    t = jax.random.normal(jax.random.fold_in(KEY, 3), (co,)) * 0.2
    got = K.upconv3x3(x, w, s, t, act)
    ref = _lax_upconv_ref(x, w, s, t, act)
    assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upconv_halo_gradients_match_lax():
    x = jax.random.normal(KEY, (1, 36, 36, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 8, 8)) * 0.1
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (8,)) * 0.1
    ct = jax.random.normal(jax.random.fold_in(KEY, 3), (1, 72, 72, 8))
    ones = jnp.ones((8,))
    gk = jax.grad(lambda *a: jnp.sum(K.upconv3x3_bias(*a, "lrelu") * ct),
                  argnums=(0, 1, 2))(x, w, b)
    gl = jax.grad(lambda x_, w_, b_: jnp.sum(
        _lax_upconv_ref(x_, w_, ones, b_, "lrelu") * ct),
        argnums=(0, 1, 2))(x, w, b)
    for name, a_, b_ in zip("xwb", gk, gl):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


@pytest.mark.parametrize("shape,co", [((2, 4, 4, 16), 8),
                                      ((3, 8, 8, 8), 16),
                                      ((2, 5, 7, 4), 8)])   # odd spatial
@pytest.mark.parametrize("act", ["none", "relu", "tanh"])
def test_upconv_s2d_forward_matches_lax(shape, co, act):
    """The space-to-depth lax formulation (depth_to_space ∘ conv3x3(x, W'))
    equals the up2_nearest+conv3x3 composition exactly."""
    cin = shape[-1]
    x = jax.random.normal(KEY, shape)
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, cin, co)) * 0.1
    s = jax.random.normal(jax.random.fold_in(KEY, 2), (co,)) * 0.3 + 1.0
    t = jax.random.normal(jax.random.fold_in(KEY, 3), (co,)) * 0.2
    got = K.upconv3x3_s2d(x, w, s, t, act)
    ref = _lax_upconv_ref(x, w, s, t, act)
    assert got.shape == (shape[0], 2 * shape[1], 2 * shape[2], co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_upconv_s2d_gradients_match_lax():
    """Pure-lax path: XLA's own VJP through the W' transform must equal the
    composition's VJP in every array arg (incl. through _s2d_upconv_weights
    and the combine map)."""
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 8, 8)) * 0.1
    s = jnp.ones((8,)) * 1.3
    t = jnp.zeros((8,)) + 0.1
    ct = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 8, 8, 8))
    gk = jax.grad(lambda *a: jnp.sum(K.upconv3x3_s2d(*a, "relu") * ct),
                  argnums=(0, 1, 2, 3))(x, w, s, t)
    gl = jax.grad(lambda *a: jnp.sum(_lax_upconv_ref(*a, "relu") * ct),
                  argnums=(0, 1, 2, 3))(x, w, s, t)
    for name, a_, b_ in zip("xwst", gk, gl):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad {name}")


def test_upconv_s2d_bias_matches():
    x = jax.random.normal(KEY, (2, 6, 6, 8))
    w = jax.random.normal(jax.random.fold_in(KEY, 1), (3, 3, 8, 8)) * 0.1
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (8,)) * 0.1
    ones = jnp.ones((8,))
    got = K.upconv3x3_s2d_bias(x, w, b, "lrelu")
    ref = _lax_upconv_ref(x, w, ones, b, "lrelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
