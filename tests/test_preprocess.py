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


# -- torch7 reader fixtures (hand-crafted binary in the public t7 format) --

import struct

from text_to_image_tpu.data import t7


class _T7Writer:
    """Serialize numpy arrays / tables in the torch7 binary format, used to
    craft test fixtures without torch or torchfile."""

    def __init__(self):
        self.buf = bytearray()
        self.next_index = 1

    def _int(self, v):
        self.buf += struct.pack("<i", v)

    def _long(self, v):
        self.buf += struct.pack("<q", v)

    def _raw_str(self, s):
        b = s.encode()
        self._int(len(b))
        self.buf += b

    def write(self, obj):
        if obj is None:
            self._int(t7.TYPE_NIL)
        elif isinstance(obj, bool):
            self._int(t7.TYPE_BOOLEAN)
            self._int(int(obj))
        elif isinstance(obj, (int, float)):
            self._int(t7.TYPE_NUMBER)
            self.buf += struct.pack("<d", float(obj))
        elif isinstance(obj, str):
            self._int(t7.TYPE_STRING)
            self._raw_str(obj)
        elif isinstance(obj, dict):
            self._int(t7.TYPE_TABLE)
            self._int(self.next_index)
            self.next_index += 1
            self._int(len(obj))
            for k, v in obj.items():
                self.write(k)
                self.write(v)
        elif isinstance(obj, list):
            self.write({i + 1: v for i, v in enumerate(obj)})
        elif isinstance(obj, np.ndarray):
            cls = {np.float32: "Float", np.float64: "Double",
                   np.int64: "Long", np.uint8: "Byte"}[obj.dtype.type]
            self._int(t7.TYPE_TORCH)
            self._int(self.next_index)
            self.next_index += 1
            self._raw_str("V 1")
            self._raw_str(f"torch.{cls}Tensor")
            self._int(obj.ndim)
            for s in obj.shape:
                self._long(s)
            strides, acc = [], 1
            for s in reversed(obj.shape):
                strides.insert(0, acc)
                acc *= s
            for s in strides:
                self._long(s)
            self._long(1)  # storageOffset (1-based)
            self._int(t7.TYPE_TORCH)
            self._int(self.next_index)
            self.next_index += 1
            self._raw_str("V 1")
            self._raw_str(f"torch.{cls}Storage")
            self._long(obj.size)
            self.buf += np.ascontiguousarray(obj).tobytes()
        else:
            raise TypeError(type(obj))

    def save(self, path, obj):
        self.write(obj)
        with open(path, "wb") as f:
            f.write(bytes(self.buf))


def test_t7_tensor_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for arr in (rng.normal(size=(6, 4, 8)).astype(np.float32),
                rng.normal(size=(3, 5)),
                rng.integers(0, 255, (4, 4), dtype=np.uint8),
                np.arange(7, dtype=np.int64)):
        path = str(tmp_path / "x.t7")
        _T7Writer().save(path, arr)
        out = t7.load_t7(path)
        np.testing.assert_array_equal(out, arr)
        assert out.dtype == arr.dtype


def test_t7_table_and_scalars(tmp_path):
    emb = np.random.default_rng(1).normal(size=(5, 2, 16)).astype(np.float32)
    obj = {"fea_txt": emb, "nsamples": 5, "flag": True, "name": "flowers"}
    path = str(tmp_path / "tbl.t7")
    _T7Writer().save(path, obj)
    out = t7.load_t7(path)
    assert out["nsamples"] == 5 and out["flag"] is True
    assert out["name"] == "flowers"
    np.testing.assert_array_equal(out["fea_txt"], emb)


def test_t7_lua_array_becomes_list(tmp_path):
    rows = [np.full((3,), i, np.float32) for i in range(4)]
    path = str(tmp_path / "arr.t7")
    _T7Writer().save(path, rows)
    out = t7.load_t7(path)
    assert isinstance(out, list) and len(out) == 4
    np.testing.assert_array_equal(out[2], rows[2])


def test_load_t7_embeddings_via_preprocess(tmp_path):
    emb = np.random.default_rng(2).normal(size=(6, 3, 32)).astype(np.float32)
    path = str(tmp_path / "emb.t7")
    _T7Writer().save(path, {"fea_txt": emb})
    out = PP.load_embeddings(path)
    np.testing.assert_allclose(out, emb)


# -- dataset-specific converters -------------------------------------------


def test_preprocess_flowers_roundtrip(tmp_path):
    from scipy.io import savemat

    n = 10
    raw = tmp_path / "raw"
    (raw / "jpg").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(1, n + 1):
        arr = rng.integers(0, 255, (60, 70, 3), dtype=np.uint8)
        Image.fromarray(arr).save(raw / "jpg" / f"image_{i:05d}.jpg")
    savemat(raw / "setid.mat", {"trnid": np.arange(1, 5)[None],
                                "valid": np.arange(5, 7)[None],
                                "tstid": np.arange(7, 11)[None]})
    labels = (np.arange(n) % 3 + 1)
    savemat(raw / "imagelabels.mat", {"labels": labels[None]})

    emb = rng.normal(size=(n, 2, 32)).astype(np.float32)
    _T7Writer().save(str(tmp_path / "emb.t7"), emb)

    out = str(tmp_path / "out")
    PP.preprocess_flowers(str(raw), str(tmp_path / "emb.t7"), out)

    ds = TextDataset(out, "train", image_size=64, embed_dim=32, seed=0)
    assert ds.num_examples == 6
    ds_test = TextDataset(out, "test", image_size=64, embed_dim=32, seed=0)
    assert ds_test.num_examples == 4
    # embeddings follow image-id order: test split starts at image id 7
    np.testing.assert_allclose(ds_test.embeddings[0], emb[6], rtol=1e-6)
    assert list(ds_test.class_ids) == list(labels[6:])
    b = ds.next_batch(4, window=2)
    assert b["real"].shape == (4, 64, 64, 3)


def _make_cub_raw(tmp_path, n=8):
    raw = tmp_path / "cub"
    rng = np.random.default_rng(4)
    lines = {"images": [], "split": [], "labels": [], "bbox": []}
    for i in range(1, n + 1):
        cls = (i - 1) % 2 + 1
        rel = f"{cls:03d}.Species_{cls}/bird_{i:02d}.jpg"
        d = raw / "images" / rel
        d.parent.mkdir(parents=True, exist_ok=True)
        arr = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d)
        lines["images"].append(f"{i} {rel}")
        lines["split"].append(f"{i} {1 if i <= 6 else 0}")
        lines["labels"].append(f"{i} {cls}")
        lines["bbox"].append(f"{i} 20.0 10.0 40.0 50.0")
    raw.mkdir(exist_ok=True)
    (raw / "images.txt").write_text("\n".join(lines["images"]))
    (raw / "train_test_split.txt").write_text("\n".join(lines["split"]))
    (raw / "image_class_labels.txt").write_text("\n".join(lines["labels"]))
    (raw / "bounding_boxes.txt").write_text("\n".join(lines["bbox"]))
    return raw


def test_preprocess_birds_roundtrip(tmp_path):
    raw = _make_cub_raw(tmp_path)
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(8, 2, 32)).astype(np.float32)
    _T7Writer().save(str(tmp_path / "emb.t7"), emb)

    out = str(tmp_path / "out")
    PP.preprocess_birds(str(raw), str(tmp_path / "emb.t7"), out)

    ds = TextDataset(out, "train", image_size=64, embed_dim=32, seed=0)
    assert ds.num_examples == 6
    ds_test = TextDataset(out, "test", image_size=64, embed_dim=32, seed=0)
    assert ds_test.num_examples == 2
    assert sorted(set(ds.class_ids)) == [1, 2]
    b = ds.next_batch(4, window=2)
    assert b["real"].shape == (4, 64, 64, 3)


def test_cub_bbox_crop_recipe():
    img = np.arange(200 * 300 * 3, dtype=np.uint8).reshape(200, 300, 3)
    # bbox x=100,y=50,w=60,h=80 → R=60, center=(130,90) → y 30:150, x 70:190
    out = PP._cub_bbox_crop(img, [100, 50, 60, 80])
    np.testing.assert_array_equal(out, img[30:150, 70:190])
    # clipping at borders
    out2 = PP._cub_bbox_crop(img, [0, 0, 100, 100])
    assert out2.shape[0] > 0 and out2.shape[1] > 0
