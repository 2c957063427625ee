"""Data-layer tests: pickle-format loader, augmentation determinism,
wrong-pair class constraint, caption windowing, pipeline stacking."""

import os
import pickle

import numpy as np
import pytest

from text_to_image_tpu.data.synthetic import SyntheticDataset
from text_to_image_tpu.data.textdataset import TextDataset
from text_to_image_tpu.data.pipeline import InputPipeline


def _write_stackgan_pickles(tmpdir, n=20, src=76, captions=3, embed=32):
    """Build a tiny StackGAN-format dataset on disk."""
    rng = np.random.default_rng(0)
    base = os.path.join(tmpdir, "train")
    os.makedirs(base, exist_ok=True)
    images = rng.integers(0, 255, (n, src, src, 3), dtype=np.uint8)
    embs = rng.normal(size=(n, captions, embed)).astype(np.float32)
    names = [f"img_{i}" for i in range(n)]
    classes = [i % 4 for i in range(n)]
    for fname, obj in [
        (f"{src}images.pickle", list(images)),
        ("char-CNN-RNN-embeddings.pickle", embs),
        ("filenames.pickle", names),
        ("class_info.pickle", classes),
    ]:
        with open(os.path.join(base, fname), "wb") as f:
            pickle.dump(obj, f)
    return tmpdir


def test_textdataset_loads_and_batches(tmp_path):
    root = _write_stackgan_pickles(str(tmp_path))
    ds = TextDataset(root, "train", image_size=64, embed_dim=32, seed=0,
                     raw_uint8=False)
    assert ds.num_examples == 20
    b = ds.next_batch(8, window=2)
    assert b["real"].shape == (8, 64, 64, 3)
    assert b["wrong"].shape == (8, 64, 64, 3)
    assert b["emb"].shape == (8, 32)
    assert b["real"].min() >= -1.0 and b["real"].max() <= 1.0


def test_textdataset_raw_uint8_default(tmp_path):
    """Production default ships uint8 (device normalizes): 4x smaller
    host→HBM payload.  Pixels must match the float path exactly."""
    root = _write_stackgan_pickles(str(tmp_path))
    raw = TextDataset(root, "train", 64, 32, seed=3).next_batch(4)
    flt = TextDataset(root, "train", 64, 32, seed=3,
                      raw_uint8=False).next_batch(4)
    assert raw["real"].dtype == np.uint8
    np.testing.assert_allclose(raw["real"] / 127.5 - 1.0, flt["real"],
                               rtol=0, atol=1e-6)


def test_textdataset_deterministic_with_seed(tmp_path):
    root = _write_stackgan_pickles(str(tmp_path))
    a = TextDataset(root, "train", 64, 32, seed=7).next_batch(4)
    b = TextDataset(root, "train", 64, 32, seed=7).next_batch(4)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_textdataset_missing_size_raises(tmp_path):
    root = _write_stackgan_pickles(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        TextDataset(root, "train", image_size=256, embed_dim=32)


def test_wrong_pairs_are_different_class():
    ds = SyntheticDataset(num_examples=64, image_size=16, embed_dim=8,
                          num_classes=4, seed=0, raw_uint8=False)
    # wrong image must differ from the real one (class-mismatched) — verify
    # by pixel: synthetic images are class-colored, so equality would mean
    # the same class color was drawn
    b = ds.next_batch(16)
    same = np.all(np.isclose(b["real"].mean((1, 2)), b["wrong"].mean((1, 2)),
                             atol=1e-3), axis=-1)
    assert not same.any()


def test_caption_window_averaging(tmp_path):
    root = _write_stackgan_pickles(str(tmp_path), captions=3)
    ds = TextDataset(root, "train", 64, 32, seed=0)
    # window >= captions → plain mean of all captions: verify against raw
    idx = np.array([0, 1])
    expected = ds.embeddings[idx].mean(axis=1)
    got = ds._sample_embeddings(idx, window=5)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_pipeline_stacks_per_critic_batches():
    ds = SyntheticDataset(num_examples=32, image_size=8, embed_dim=8)
    pipe = InputPipeline(ds, batch_size=4, env=None, batches_per_step=3)
    batch = next(pipe)
    assert batch["real"].shape == (3, 4, 8, 8, 3)
    assert batch["emb"].shape == (3, 4, 8)
    pipe.close()


def test_pipeline_shards_over_mesh():
    import jax
    from text_to_image_tpu.parallel.mesh import create_mesh
    env = create_mesh(data=8, model=1)
    ds = SyntheticDataset(num_examples=32, image_size=8, embed_dim=8)
    pipe = InputPipeline(ds, batch_size=16, env=env, batches_per_step=1)
    batch = next(pipe)
    assert batch["real"].shape == (1, 16, 8, 8, 3)
    assert len(batch["real"].sharding.device_set) == 8
    pipe.close()

    with pytest.raises(ValueError):
        InputPipeline(ds, batch_size=12, env=env)  # 12 % 8 != 0


def test_textdataset_from_arrays_serves_like_pickles():
    """In-memory constructor (bench harness path) uses the same serving
    path: crop to target size, [-1,1] range when raw_uint8=False, wrong
    pairs from a different class, windowed caption averaging."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (24, 76, 76, 3), dtype=np.uint8)
    embs = rng.normal(size=(24, 5, 32)).astype(np.float32)
    cls = np.arange(24) % 4
    ds = TextDataset.from_arrays(imgs, embs, cls, image_size=64,
                                 raw_uint8=False, seed=1)
    b = ds.next_batch(8, window=4)
    assert b["real"].shape == (8, 64, 64, 3)
    assert b["real"].dtype == np.float32
    assert b["real"].min() >= -1.0 and b["real"].max() <= 1.0
    assert b["emb"].shape == (8, 32)

    ds8 = TextDataset.from_arrays(imgs, embs, cls, image_size=64, seed=1)
    b8 = ds8.next_batch(8, window=4)
    assert b8["real"].dtype == np.uint8
