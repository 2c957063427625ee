"""Golden tests for the loss math (SURVEY.md §4: CE-CLS 3-term, WGAN-GP on
analytic critics with known gradient norm, CA-KL closed form)."""

import jax
import jax.numpy as jnp
import numpy as np

from text_to_image_tpu.models import losses as LL


def test_sigmoid_ce_golden():
    # logit 0 → CE log(2) for either label
    np.testing.assert_allclose(LL.sigmoid_ce(jnp.zeros(4), 1.0), np.log(2),
                               rtol=1e-6)
    np.testing.assert_allclose(LL.sigmoid_ce(jnp.zeros(4), 0.0), np.log(2),
                               rtol=1e-6)
    # large logit, correct label → ~0
    assert LL.sigmoid_ce(jnp.full(4, 20.0), 1.0) < 1e-6
    # matches the unstable formula on moderate values
    x = jnp.array([-3.0, -0.5, 0.7, 4.0])
    ref = -(np.log(jax.nn.sigmoid(x)))
    np.testing.assert_allclose(LL.sigmoid_ce(x, 1.0), ref.mean(), rtol=1e-5)


def test_gan_cls_d_loss_composition():
    r, f, w = jnp.zeros(4), jnp.zeros(4), jnp.zeros(4)
    out = LL.gan_cls_d_loss(r, f, w)
    np.testing.assert_allclose(out["d_loss"], 2 * np.log(2), rtol=1e-6)


def test_gan_cls_g_loss_with_interp():
    out = LL.gan_cls_g_loss(jnp.zeros(4), jnp.zeros(4), interp_weight=0.5)
    np.testing.assert_allclose(out["g_loss"], 1.5 * np.log(2), rtol=1e-6)


def test_interpolate_embeddings():
    emb = jnp.array([[0.0, 0.0], [2.0, 2.0]])
    out = LL.interpolate_embeddings(emb, beta=0.5)
    np.testing.assert_allclose(out, [[1.0, 1.0], [1.0, 1.0]])


def test_gradient_penalty_analytic():
    """Critic D(x) = a·Σx has ∇x̂D = a everywhere → ‖∇‖ = a·√P exactly."""
    b, h, w, c = 4, 2, 2, 3
    p = h * w * c
    real = jnp.zeros((b, h, w, c))
    fake = jnp.ones((b, h, w, c))
    eps = jnp.full((b, 1, 1, 1), 0.3)

    for a in (1.0 / np.sqrt(p), 2.0):
        gp = LL.gradient_penalty(
            lambda x, a=a: a * jnp.sum(x, axis=(1, 2, 3)), real, fake, eps)
        expected = (a * np.sqrt(p) - 1.0) ** 2
        np.testing.assert_allclose(gp, expected, rtol=1e-5, atol=1e-6)


def test_gradient_penalty_differentiable():
    """grad of GP w.r.t. critic params must exist (double backprop)."""
    real = jnp.zeros((2, 2, 2, 1))
    fake = jnp.ones((2, 2, 2, 1))
    eps = jnp.full((2, 1, 1, 1), 0.5)

    def loss(a):
        return LL.gradient_penalty(
            lambda x: a * jnp.sum(x**2, axis=(1, 2, 3)), real, fake, eps)

    g = jax.grad(loss)(2.0)
    assert np.isfinite(g)


def test_wgan_d_loss_signs():
    real = jnp.full(4, 3.0)
    fake = jnp.full(4, 1.0)
    wrong = jnp.full(4, 2.0)
    out = LL.wgan_cls_d_loss(real, fake, wrong, gp=jnp.float32(0.25),
                             mismatch_alpha=0.5, gp_lambda=10.0)
    np.testing.assert_allclose(out["w_dist"], 2.0)
    # (1-3) + 0.5*(2-3) + 10*0.25 = -2 - 0.5 + 2.5 = 0
    np.testing.assert_allclose(out["d_loss"], 0.0, atol=1e-6)


def test_wgan_drift_penalty():
    real = jnp.full(4, 2.0)
    base = LL.wgan_cls_d_loss(real, real, real, gp=jnp.float32(0.0),
                              mismatch_alpha=0.0, gp_lambda=0.0)
    drift = LL.wgan_cls_d_loss(real, real, real, gp=jnp.float32(0.0),
                               mismatch_alpha=0.0, gp_lambda=0.0,
                               drift_epsilon=0.001)
    # ε·(E[D(real)²] + E[D(wrong)²]) — the anchor covers the mismatched
    # scores too (the GP-unconstrained text direction; models/losses.py)
    np.testing.assert_allclose(float(drift["d_loss"] - base["d_loss"]),
                               0.001 * (4.0 + 4.0), rtol=1e-6)


def test_ca_kl_closed_form():
    mu = jnp.array([[0.0, 1.0]])
    logvar = jnp.array([[0.0, 0.0]])
    # KL = -1/2 * sum(1 + 0 - mu² - 1) = 1/2 * sum(mu²) = 0.5
    np.testing.assert_allclose(LL.ca_kl_loss(mu, logvar), 0.5, rtol=1e-6)
    # standard normal → 0
    np.testing.assert_allclose(
        LL.ca_kl_loss(jnp.zeros((3, 5)), jnp.zeros((3, 5))), 0.0, atol=1e-7)


def test_gan_cls_d_loss_one_sided_label_smoothing():
    """real_label < 1 softens only the real-stream target: d_real becomes
    CE vs the smoothed label (nonzero floor even when D is certain), while
    fake/wrong terms are untouched (one-sided — Salimans et al. 2016)."""
    r = jnp.asarray([4.0, 6.0])  # D confidently right on reals
    f = jnp.asarray([-5.0, -3.0])
    w = jnp.asarray([-4.0, -4.0])
    plain = LL.gan_cls_d_loss(r, f, w)
    smooth = LL.gan_cls_d_loss(r, f, w, real_label=0.9)
    # golden: CE(x, z) = max(x,0) - x*z + log1p(exp(-|x|))
    x = np.asarray(r, np.float64)
    want = np.mean(np.maximum(x, 0) - x * 0.9 + np.log1p(np.exp(-np.abs(x))))
    np.testing.assert_allclose(float(smooth["d_real"]), want, rtol=1e-6)
    # the smoothed real term has a floor ~ (1-z)*logit; the plain one -> 0
    assert float(smooth["d_real"]) > float(plain["d_real"]) + 0.3
    np.testing.assert_allclose(float(smooth["d_fake"]), float(plain["d_fake"]))
    np.testing.assert_allclose(float(smooth["d_wrong"]),
                               float(plain["d_wrong"]))
    # default real_label=1.0 is the reference behavior
    np.testing.assert_allclose(float(LL.gan_cls_d_loss(r, f, w)["d_loss"]),
                               float(plain["d_loss"]))
