"""Unit tests for the functional op library (SURVEY.md §4 test plan: kernel/
layer correctness vs analytic expectations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.ops import layers as L


KEY = jax.random.PRNGKey(0)


def test_linear_shapes_and_math():
    p = L.linear_init(KEY, 4, 3)
    x = jnp.ones((2, 4))
    y = L.linear(p, x)
    assert y.shape == (2, 3)
    np.testing.assert_allclose(y, x @ p["w"] + p["b"], rtol=1e-6)


def test_conv2d_stride2_halves_spatial():
    p = L.conv2d_init(KEY, 5, 3, 8)
    y = L.conv2d(p, jnp.ones((2, 16, 16, 3)), stride=2)
    assert y.shape == (2, 8, 8, 8)


def test_conv2d_transpose_doubles_spatial():
    p = L.conv2d_transpose_init(KEY, 5, 8, 4)
    y = L.conv2d_transpose(p, jnp.ones((2, 8, 8, 8)), stride=2)
    assert y.shape == (2, 16, 16, 4)


def test_conv_transpose_is_conv_gradient():
    """convT(x, w) must be the vjp of conv(·, w) — TF1 deconv2d semantics."""
    kw, kg = jax.random.split(KEY, 2)
    w = jax.random.normal(kw, (5, 5, 3, 4))  # conv: 3→4 channels
    g = jax.random.normal(kg, (2, 4, 4, 4))  # cotangent of conv output

    def conv(inp):
        return jax.lax.conv_general_dilated(
            inp, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, vjp = jax.vjp(conv, jnp.zeros((2, 8, 8, 3)))
    expected = vjp(g)[0]                      # [2,8,8,3]
    # conv_transpose with the flipped+transposed kernel reproduces the vjp
    got = jax.lax.conv_transpose(
        g, jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_batch_norm_normalizes_and_updates_state():
    p, s = L.batch_norm_init(4)
    x = jax.random.normal(KEY, (32, 2, 2, 4)) * 3.0 + 5.0
    y, s2 = L.batch_norm(p, s, x, train=True)
    np.testing.assert_allclose(np.mean(np.asarray(y), axis=(0, 1, 2)),
                               np.zeros(4), atol=1e-4)
    np.testing.assert_allclose(np.std(np.asarray(y), axis=(0, 1, 2)),
                               np.ones(4), atol=1e-3)
    # running stats moved toward batch stats with momentum 0.9
    np.testing.assert_allclose(s2["mean"], 0.1 * np.mean(
        np.asarray(x), axis=(0, 1, 2)), rtol=1e-4)


def test_batch_norm_eval_uses_running_stats():
    p, s = L.batch_norm_init(2)
    s = {"mean": jnp.array([1.0, 2.0]), "var": jnp.array([4.0, 9.0])}
    x = jnp.ones((3, 1, 1, 2))
    y, s2 = L.batch_norm(p, s, x, train=False)
    expected = (1.0 - np.array([1.0, 2.0])) / np.sqrt(np.array([4.0, 9.0]) + 1e-5)
    np.testing.assert_allclose(y[0, 0, 0], expected, rtol=1e-4)
    assert s2 is s


def test_layer_norm_per_example():
    p = L.layer_norm_init(4)
    x = jax.random.normal(KEY, (8, 2, 2, 4)) * 2 + 3
    y = np.asarray(L.layer_norm(p, x))
    np.testing.assert_allclose(y.mean(axis=(1, 2, 3)), np.zeros(8), atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(1, 2, 3)), np.ones(8), atol=1e-3)


def test_lrelu():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(L.lrelu(x), [-0.2, 0.0, 2.0])


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = L.upsample_nearest(x, 2)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(y[0, :2, :2, 0], np.full((2, 2), 0.0))
    np.testing.assert_allclose(y[0, 2:, 2:, 0], np.full((2, 2), 3.0))


def test_tile_and_concat():
    x = jnp.zeros((2, 4, 4, 3))
    t = jnp.arange(10.0).reshape(2, 5)
    y = L.tile_and_concat(x, t)
    assert y.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(y[1, 3, 2, 3:], t[1])


def test_policy_bf16_roundtrip():
    pol = L.Policy.from_str("bfloat16")
    assert pol.cast(jnp.ones((2,), jnp.float32)).dtype == jnp.bfloat16
