"""Preprocessing: raw Oxford-102 flowers / CUB-200 birds images + reedscot
char-CNN-RNN embeddings → StackGAN-format pickles (rebuild of the reference's
``preprocess/`` scripts — SURVEY.md §2 "Preprocess scripts").

Outputs per split (train/test) under ``<out_dir>/<split>/``:
* ``76images.pickle``   — images resized to 76×76   (64-px random-crop source)
* ``304images.pickle``  — images resized to 304×304 (256-px random-crop source)
* ``char-CNN-RNN-embeddings.pickle`` — [N, C, 1024] float32
* ``filenames.pickle``, ``class_info.pickle``

Embedding sources supported:
* ``.t7`` torch7 files from reedscot/icml2016 (needs the ``torchfile`` pip
  package — gated import, with a clear error if absent), or
* a pre-converted ``.npz``/``.pickle`` with the same content.

Usage:
    python -m text_to_image_tpu.data.preprocess \
        --images /path/oxford102/jpg --embeddings /path/flowers_icml \
        --classes /path/classes.txt --out data/flowers
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, List, Sequence, Tuple

import numpy as np

TARGET_SIZES = (76, 304)  # load-bearing: crop sources for 64 and 256 px


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("preprocessing needs PIL") from e
    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR),
        dtype=np.uint8)


def load_image(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def load_t7_embeddings(path: str) -> np.ndarray:
    """Load a reedscot/icml2016 char-CNN-RNN .t7 embedding file."""
    try:
        import torchfile
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "reading .t7 embeddings needs the `torchfile` package; convert "
            "them offline to .npz (key 'embeddings' [N,C,1024]) instead") from e
    data = torchfile.load(path)
    return np.asarray(data, dtype=np.float32)


def load_embeddings(path: str) -> np.ndarray:
    """[N, C, 1024] embeddings from .t7 / .npz / .pickle."""
    if path.endswith(".t7"):
        emb = load_t7_embeddings(path)
    elif path.endswith(".npz"):
        emb = np.load(path)["embeddings"]
    else:
        with open(path, "rb") as f:
            emb = np.asarray(pickle.load(f, encoding="latin1"))
    emb = np.asarray(emb, dtype=np.float32)
    if emb.ndim == 2:
        emb = emb[:, None, :]
    assert emb.ndim == 3, f"expected [N,C,E] embeddings, got {emb.shape}"
    return emb


def write_split(out_dir: str, split: str, filenames: Sequence[str],
                images: Sequence[np.ndarray], embeddings: np.ndarray,
                class_ids: Sequence[int]) -> None:
    assert len(filenames) == len(images) == len(embeddings) == len(class_ids)
    base = os.path.join(out_dir, split)
    os.makedirs(base, exist_ok=True)
    for size in TARGET_SIZES:
        resized = [_resize(img, size) for img in images]
        with open(os.path.join(base, f"{size}images.pickle"), "wb") as f:
            pickle.dump(resized, f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(base, "char-CNN-RNN-embeddings.pickle"), "wb") as f:
        pickle.dump(np.asarray(embeddings, np.float32), f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(base, "filenames.pickle"), "wb") as f:
        pickle.dump(list(filenames), f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(base, "class_info.pickle"), "wb") as f:
        pickle.dump(list(map(int, class_ids)), f,
                    protocol=pickle.HIGHEST_PROTOCOL)


def preprocess(images_dir: str, embeddings_path: str, out_dir: str,
               class_map: Dict[str, int], split_map: Dict[str, str]) -> None:
    """Generic driver: `class_map` filename→class id, `split_map`
    filename→'train'|'test'."""
    per_split: Dict[str, Tuple[List, List, List, List]] = {
        "train": ([], [], [], []), "test": ([], [], [], [])}
    embeddings = load_embeddings(embeddings_path)
    names = sorted(class_map)
    assert len(names) == len(embeddings), (
        f"{len(names)} images vs {len(embeddings)} embedding rows")
    for i, name in enumerate(names):
        split = split_map.get(name, "train")
        fn, im, em, cl = per_split[split]
        fn.append(name)
        im.append(load_image(os.path.join(images_dir, name)))
        em.append(embeddings[i])
        cl.append(class_map[name])
    for split, (fn, im, em, cl) in per_split.items():
        if fn:
            write_split(out_dir, split, fn, im, np.stack(em), cl)


def main():  # pragma: no cover
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--embeddings", required=True)
    p.add_argument("--classes", required=True,
                   help="txt: '<filename> <class_id> [train|test]' per line")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    class_map, split_map = {}, {}
    with open(args.classes) as f:
        for line in f:
            parts = line.split()
            class_map[parts[0]] = int(parts[1])
            if len(parts) > 2:
                split_map[parts[0]] = parts[2]
    preprocess(args.images, args.embeddings, args.out, class_map, split_map)


if __name__ == "__main__":  # pragma: no cover
    main()
