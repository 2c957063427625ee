"""NaturalPhotoDataset — real-photograph crops with TextDataset semantics.

Validates the offline natural-image stand-in (data/natural.py): class
structure on real pixels, TextDataset-consistent augmentation geometry on
both data paths, and the config wiring.  Gated on the provider packages
(sklearn/matplotlib sample images) being present.
"""

import numpy as np
import pytest

from text_to_image_tpu.data import natural

pytestmark = pytest.mark.skipif(not natural.available(),
                                reason="bundled sample photos not found")


@pytest.fixture(scope="module")
def ds():
    return natural.NaturalPhotoDataset(examples_per_class=16, image_size=64,
                                       embed_dim=128, seed=0)


def test_shapes_and_sizes(ds):
    n = 8 * 16
    assert ds.images.shape == (n, 76, 76, 3)       # 64·19/16 source
    assert ds.images.dtype == np.uint8
    assert ds.embeddings.shape == (n, 4, 128)
    assert ds.class_ids.shape == (n,)
    assert ds.num_classes == 8
    assert ds.image_size == 64                      # crop TARGET, like TextDataset


def test_classes_are_visually_distinct(ds):
    """Per-class mean colors must differ — the fixed-z color-correlation
    metric (eval/synthetic_quality.py) needs real spread between classes."""
    colors = np.stack([
        ds.images[ds.class_ids == c].astype(np.float32).mean(axis=(0, 1, 2))
        for c in range(8)]) / 255.0
    d = np.linalg.norm(colors[:, None] - colors[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert (d.min() > 0.03), f"nearest class pair too similar: {d.min():.4f}"
    # and real photographs have texture the synthetic task lacks: within a
    # class, crops are jittered — no two examples identical
    c0 = ds.images[ds.class_ids == 0]
    assert not np.array_equal(c0[0], c0[1])


def test_deterministic_construction():
    a = natural.NaturalPhotoDataset(examples_per_class=4, image_size=64,
                                    embed_dim=32, seed=3)
    b = natural.NaturalPhotoDataset(examples_per_class=4, image_size=64,
                                    embed_dim=32, seed=3)
    assert np.array_equal(a.images, b.images)
    assert np.allclose(a.embeddings, b.embeddings)


def test_next_batch_crops_to_image_size(ds):
    batch = ds.next_batch(32, window=2)
    assert batch["real"].shape == (32, 64, 64, 3)
    assert batch["wrong"].shape == (32, 64, 64, 3)
    assert batch["real"].dtype == np.uint8
    assert batch["emb"].shape == (32, 128)


def test_wrong_pairs_cross_class():
    # with distinct per-class embedding centroids, a wrong image's class
    # must differ from the matched embedding's class; check via next_batch
    # on an unshuffled tiny dataset where classes are identifiable by the
    # embedding centroid.
    d = natural.NaturalPhotoDataset(examples_per_class=8, image_size=64,
                                    embed_dim=16, seed=1)
    # reconstruct class of each batch element by nearest centroid
    cents = np.stack([d.embeddings[d.class_ids == c][:, 0].mean(0)
                      for c in range(8)])
    batch = d.next_batch(64, window=4)
    emb_cls = np.argmin(
        np.linalg.norm(batch["emb"][:, None] - cents[None], axis=-1), axis=1)
    wrong_colors = batch["wrong"].astype(np.float32).mean(axis=(1, 2)) / 255
    real_colors = batch["real"].astype(np.float32).mean(axis=(1, 2)) / 255
    # wrong image should on average be farther from the matched class's
    # color than the real image is (statistical, not per-example — crops of
    # different regions can share colors)
    class_colors = np.stack([
        d.images[d.class_ids == c].astype(np.float32).mean(axis=(0, 1, 2))
        for c in range(8)]) / 255
    real_err = np.linalg.norm(real_colors - class_colors[emb_cls], axis=1)
    wrong_err = np.linalg.norm(wrong_colors - class_colors[emb_cls], axis=1)
    assert wrong_err.mean() > real_err.mean()


def test_device_resident_staging(ds):
    """The resident path's class tables accept the natural split and its
    compiled crop matches the host geometry (76 -> 64)."""
    import jax
    from text_to_image_tpu.data import device as DD
    data = DD.stage(ds)
    batch = jax.jit(lambda k: DD.sample_batch(
        data, k, 16, 64, 4, True, True))(jax.random.PRNGKey(0))
    assert batch["real"].shape == (16, 64, 64, 3)
    assert batch["real"].dtype == np.uint8
    assert batch["emb"].shape == (16, 128)


@pytest.mark.slow
def test_synthetic_quality_crop_branch():
    """evaluate() must center-crop a crop-source dataset (images stored at
    76px) to the generated resolution before classifier finetune/IS — the
    branch added for NaturalPhotoDataset (eval/synthetic_quality.py)."""
    import dataclasses
    import jax.numpy as jnp
    from text_to_image_tpu.config import Config
    from text_to_image_tpu.eval.synthetic_quality import evaluate
    from text_to_image_tpu.train.state import TrainState

    d = natural.NaturalPhotoDataset(examples_per_class=8, image_size=64,
                                    embed_dim=32, seed=0)
    cfg = Config()
    cfg = cfg.replace(gan=dataclasses.replace(cfg.gan, z_dim=8, embed_dim=32))
    # stub generator: class centroid color fields at 64px — IS should be
    # near-max and r near 1 if evaluate crops/aligns everything correctly
    cents = np.stack([d.embeddings[d.class_ids == c][:, 0].mean(0)
                      for c in range(8)])
    colors = np.stack([
        d.images[d.class_ids == c].astype(np.float32).mean(axis=(0, 1, 2))
        for c in range(8)]) / 127.5 - 1.0

    def gen(g_params, g_state, aux, z, e, key):
        cls = jnp.argmin(jnp.linalg.norm(
            e[:, None] - jnp.asarray(cents)[None], axis=-1), axis=1)
        return jnp.broadcast_to(
            jnp.asarray(colors)[cls][:, None, None, :],
            (e.shape[0], 64, 64, 3))

    ts = TrainState(g_params={}, g_state={}, d_params={}, d_state={},
                    g_opt=None, d_opt=None, step=jnp.int32(0))
    q = evaluate(gen, ts, cfg, d, num_classes=8, num_images=256)
    assert q["r"] > 0.95
    assert q["is_mean"] > 2.0   # flat colors, cropped real texture: clf
    # trained on real 64px crops still separates the 8 color centroids
    # conditional accuracy well above chance (1/8) even though the stub's
    # flat color fields are out-of-distribution for the texture-trained
    # classifier (measured 0.5 on CPU, 2026-08-19)
    assert q["cond_acc"] > 0.3


def test_get_dataset_wiring():
    import dataclasses
    from text_to_image_tpu.config import Config
    from text_to_image_tpu.data import get_dataset
    cfg = Config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset_name="natural", image_size=64))
    d = get_dataset(cfg)
    assert isinstance(d, natural.NaturalPhotoDataset)
    assert d.images.shape[1] == 76
    assert d.embed_dim == cfg.gan.embed_dim


# ------------------------- 16-class / roaming set ---------------------------

avail16 = natural.available(natural.ANCHORS16)


@pytest.mark.skipif(not avail16, reason="texture asset packages not found")
def test_anchors16_structure():
    """ANCHORS16 must deliver >= 16 classes from >= 6 distinct source images
    (round-4 VERDICT #7) with distinct per-class statistics."""
    assert len(natural.ANCHORS16) >= 16
    assert len({a[0] for a in natural.ANCHORS16}) >= 6
    d = natural.NaturalPhotoDataset(examples_per_class=8, image_size=64,
                                    embed_dim=32, seed=0,
                                    anchors=natural.ANCHORS16)
    n_cls = len(natural.ANCHORS16)
    assert d.num_classes == n_cls
    assert d.images.shape == (8 * n_cls, 76, 76, 3)
    # per-class (mean, std) signatures must spread — no duplicated class
    sig = np.stack([
        np.concatenate([
            d.images[d.class_ids == c].astype(np.float32).mean(axis=(0, 1, 2))
            / 255.0,
            [d.images[d.class_ids == c].astype(np.float32).std() / 255.0]])
        for c in range(n_cls)])
    dist = np.linalg.norm(sig[:, None] - sig[None, :], axis=-1)
    np.fill_diagonal(dist, np.inf)
    assert dist.min() > 0.02, f"nearest class pair too similar: {dist.min():.4f}"


@pytest.mark.skipif(not avail16, reason="texture asset packages not found")
def test_roaming_classes_more_diverse_than_anchored():
    """Roaming classes sample the whole texture with rotation — their
    intra-class layout diversity must not collapse to near-identical crops;
    the sky class (clouds) must exceed every anchored class's diversity."""
    d = natural.NaturalPhotoDataset(examples_per_class=8, image_size=64,
                                    embed_dim=32, seed=0,
                                    anchors=natural.ANCHORS16)

    def spread(c):
        im = d.images[d.class_ids == c].astype(np.float32)
        return np.mean([np.abs(im[i] - im[j]).mean()
                        for i in range(len(im)) for j in range(i)])

    anchored = [spread(c) for c in range(8)]
    sky = spread(13)  # ANCHORS16[13] = sky (cumulus clouds)
    assert sky > max(anchored)
    # every roaming class keeps non-degenerate diversity
    for c in range(8, d.num_classes):
        assert spread(c) > 1.0, f"roam class {c} collapsed"


@pytest.mark.skipif(not avail16, reason="texture asset packages not found")
def test_natural16_factory_and_determinism():
    import dataclasses
    from text_to_image_tpu.config import Config
    from text_to_image_tpu.data import get_dataset
    cfg = Config()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, dataset_name="natural16", image_size=64))
    d = get_dataset(cfg)
    assert d.num_classes == len(natural.ANCHORS16)
    d2 = get_dataset(cfg)
    assert np.array_equal(d.images, d2.images)


@pytest.mark.slow
def test_synthetic_quality_clf_cache_reuses_classifier():
    """Passing the same clf_cache dict across evaluate() calls finetunes the
    eval classifier ONCE — trajectory evals need one consistent instrument
    (scripts/chained_stackgan.py --traj)."""
    import dataclasses
    import jax.numpy as jnp
    from text_to_image_tpu.config import Config
    from text_to_image_tpu.eval import synthetic_quality as sq
    from text_to_image_tpu.train.state import TrainState

    d = natural.NaturalPhotoDataset(examples_per_class=8, image_size=64,
                                    embed_dim=32, seed=0)
    cfg = Config()
    cfg = cfg.replace(gan=dataclasses.replace(cfg.gan, z_dim=8, embed_dim=32))

    def gen(g_params, g_state, aux, z, e, key):
        return jnp.zeros((e.shape[0], 64, 64, 3))

    ts = TrainState(g_params={}, g_state={}, d_params={}, d_state={},
                    g_opt=None, d_opt=None, step=jnp.int32(0))
    calls = []
    real_train = sq.train_classifier

    def counting_train(*a, **kw):
        calls.append(1)
        return real_train(*a, **kw)

    cache = {}
    try:
        sq.train_classifier = counting_train
        q1 = sq.evaluate(gen, ts, cfg, d, num_classes=8, num_images=128,
                         clf_cache=cache)
        q2 = sq.evaluate(gen, ts, cfg, d, num_classes=8, num_images=128,
                         clf_cache=cache)
    finally:
        sq.train_classifier = real_train
    assert len(calls) == 1
    assert q1["clf_acc"] == q2["clf_acc"]
