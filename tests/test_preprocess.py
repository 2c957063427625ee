"""Preprocess round-trip: raw images + embeddings → StackGAN pickles →
TextDataset serves batches from them."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from text_to_image_tpu.data import preprocess as PP
from text_to_image_tpu.data.textdataset import TextDataset


def _make_raw(tmp_path, n=10):
    img_dir = tmp_path / "jpg"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        name = f"image_{i:03d}.jpg"
        arr = rng.integers(0, 255, (50 + i, 40 + i, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / name)
        names.append(name)
    emb = rng.normal(size=(n, 4, 32)).astype(np.float32)
    np.savez(tmp_path / "emb.npz", embeddings=emb)
    class_map = {nm: i % 3 for i, nm in enumerate(sorted(names))}
    split_map = {nm: ("test" if i % 5 == 0 else "train")
                 for i, nm in enumerate(sorted(names))}
    return str(img_dir), str(tmp_path / "emb.npz"), class_map, split_map


def test_preprocess_roundtrip(tmp_path):
    img_dir, emb_path, class_map, split_map = _make_raw(tmp_path)
    out = str(tmp_path / "out")
    PP.preprocess(img_dir, emb_path, out, class_map, split_map)

    for split, count in (("train", 8), ("test", 2)):
        base = os.path.join(out, split)
        for f in ("76images.pickle", "304images.pickle",
                  "char-CNN-RNN-embeddings.pickle", "filenames.pickle",
                  "class_info.pickle"):
            assert os.path.exists(os.path.join(base, f)), f"{split}/{f}"

    ds = TextDataset(out, "train", image_size=64, embed_dim=32, seed=0)
    assert ds.num_examples == 8
    b = ds.next_batch(4, window=2)
    assert b["real"].shape == (4, 64, 64, 3)
    assert b["emb"].shape == (4, 32)

    # 256px path from the same preprocess output
    ds256 = TextDataset(out, "train", image_size=256, embed_dim=32, seed=0)
    assert ds256.next_batch(2)["real"].shape == (2, 256, 256, 3)


def test_load_embeddings_2d_promotes_caption_axis(tmp_path):
    emb = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    np.savez(tmp_path / "e.npz", embeddings=emb)
    out = PP.load_embeddings(str(tmp_path / "e.npz"))
    assert out.shape == (5, 1, 16)
