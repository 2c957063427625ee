"""Native C++ input-pipeline kernels vs numpy fallback equivalence."""

import numpy as np
import pytest

from text_to_image_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


def test_library_builds(lib_available):
    # g++ is part of the toolchain; build failure would silently degrade the
    # pipeline, so surface it as a test failure
    assert lib_available, "libt2i_augment.so failed to build/load"


def _fallback_crop(images, idx, size, ys, xs, flips):
    out = np.empty((len(idx), size, size, 3), np.float32)
    for i in range(len(idx)):
        p = images[idx[i], ys[i]:ys[i] + size, xs[i]:xs[i] + size]
        if flips[i]:
            p = p[:, ::-1]
        out[i] = p
    return out / 127.5 - 1.0


def test_crop_flip_normalize_matches_numpy(lib_available):
    if not lib_available:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (10, 76, 76, 3), np.uint8)
    idx = rng.integers(0, 10, 16).astype(np.int64)
    ys = rng.integers(0, 76 - 64 + 1, 16).astype(np.int32)
    xs = rng.integers(0, 76 - 64 + 1, 16).astype(np.int32)
    flips = (rng.random(16) < 0.5).astype(np.uint8)

    got = native.crop_flip_normalize(images, idx, 64, ys, xs, flips)
    ref = _fallback_crop(images, idx, 64, ys, xs, flips)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    assert got.dtype == np.float32
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_gather_average_matches_numpy(lib_available):
    if not lib_available:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(12, 5, 32)).astype(np.float32)
    idx = rng.integers(0, 12, 8).astype(np.int64)
    picks = rng.integers(0, 5, (8, 3)).astype(np.int64)

    got = native.gather_average_embeddings(emb, idx, picks)
    ref = emb[idx[:, None], picks].mean(axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
