"""Device-resident data path (data/device.py): on-device batch assembly must
match ``TextDataset.next_batch`` semantics — valid crops, mirror flips,
distinct-caption averaging, exactly-uniform different-class wrong pairs —
and the resident train step must be a pure, resumable function of
(state, staged arrays)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_image_tpu.data import device as DD
from text_to_image_tpu.data.synthetic import SyntheticDataset
from tests.helpers import tiny_config


def _toy_data(n=24, src=12, c=4, e=8, classes=3, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, src, src, 3), dtype=np.uint8)
    embeddings = rng.normal(size=(n, c, e)).astype(np.float32)
    class_ids = np.arange(n) % classes
    perm, other_start, other_count = DD.class_tables(class_ids)
    data = DD.DeviceData(
        images=jnp.asarray(images), embeddings=jnp.asarray(embeddings),
        class_perm=jnp.asarray(perm), other_start=jnp.asarray(other_start),
        other_count=jnp.asarray(other_count))
    return data, images, embeddings, class_ids


def test_class_tables_enumerate_exactly_the_other_classes():
    class_ids = np.array([0, 1, 1, 2, 0, 2, 2, 1])
    perm, other_start, other_count = DD.class_tables(class_ids)
    n = len(class_ids)
    for i, c in enumerate(class_ids):
        ring = [perm[(other_start[i] + u) % n] for u in range(other_count[i])]
        expect = sorted(j for j in range(n) if class_ids[j] != c)
        assert sorted(ring) == expect, f"example {i}"


def test_class_tables_reject_single_class():
    with pytest.raises(ValueError, match="wrong pair"):
        DD.class_tables(np.zeros(5, np.int64))


def test_wrong_pairs_always_differ_and_cover_all_other_examples():
    data, _, _, class_ids = _toy_data()
    n = len(class_ids)
    seen = set()
    for s in range(40):
        b = DD.sample_batch(data, jax.random.PRNGKey(s), 16, 12, 99,
                            random_crop=False, random_flip=False)
        # recompute the indices the sampler drew (same key schedule)
        kidx, kw, *_ = jax.random.split(jax.random.PRNGKey(s), 5)
        idx = np.asarray(jax.random.randint(kidx, (16,), 0, n))
        u = np.asarray(jax.random.randint(
            kw, (16,), 0, data.other_count[idx]))
        wrong = np.asarray(data.class_perm)[
            (np.asarray(data.other_start)[idx] + u) % n]
        assert (class_ids[wrong] != class_ids[idx]).all()
        seen.update(wrong.tolist())
    # exact-uniform draw reaches every example (each class has wrong-pairs
    # available from both other classes in the toy set)
    assert seen == set(range(n))


def test_batch_matches_gather_without_crop_flip():
    data, images, embeddings, _ = _toy_data()
    key = jax.random.PRNGKey(7)
    b = DD.sample_batch(data, key, 8, 12, 99, random_crop=False,
                        random_flip=False)
    kidx, kw, *_ = jax.random.split(key, 5)
    idx = np.asarray(jax.random.randint(kidx, (8,), 0, len(images)))
    np.testing.assert_array_equal(np.asarray(b["real"]), images[idx])
    assert b["real"].dtype == jnp.uint8
    # window >= #captions → plain mean of all captions, float32
    np.testing.assert_allclose(np.asarray(b["emb"]),
                               embeddings[idx].mean(1), rtol=1e-6)


def test_crop_is_a_valid_window_and_flip_is_a_mirror():
    # image pixels encode their (y, x) coordinates → recover the crop offset
    # from the output and check the whole tile is one contiguous window
    n, src, size = 6, 12, 8
    ys, xs = np.meshgrid(np.arange(src), np.arange(src), indexing="ij")
    base = np.stack([ys, xs, np.zeros_like(ys)], -1).astype(np.uint8)
    images = np.tile(base, (n, 1, 1, 1))
    images[..., 2] = np.arange(n, dtype=np.uint8)[:, None, None]  # id plane
    data = DD.DeviceData(
        images=jnp.asarray(images),
        embeddings=jnp.zeros((n, 2, 4), jnp.float32),
        class_perm=jnp.asarray(DD.class_tables(np.arange(n) % 2)[0]),
        other_start=jnp.asarray(DD.class_tables(np.arange(n) % 2)[1]),
        other_count=jnp.asarray(DD.class_tables(np.arange(n) % 2)[2]))
    for s in range(10):
        b = np.asarray(DD.sample_batch(data, jax.random.PRNGKey(s), 4, size,
                                       99, random_crop=True,
                                       random_flip=True)["real"])
        for img in b:
            y0, x_edge = int(img[0, 0, 0]), int(img[0, 0, 1])
            flipped = int(img[0, 0, 1]) > int(img[0, -1, 1])
            cols = img[0, :, 1][::-1] if flipped else img[0, :, 1]
            x0 = int(cols[0])
            assert 0 <= y0 <= src - size and 0 <= x0 <= src - size
            want_y = np.arange(y0, y0 + size)
            want_x = np.arange(x0, x0 + size)
            np.testing.assert_array_equal(img[:, 0, 0], want_y)
            np.testing.assert_array_equal(cols, want_x)
            assert (img[..., 2] == img[0, 0, 2]).all()  # one source image


def test_caption_window_averages_distinct_captions():
    # one-hot captions scaled by row → the mean reveals WHICH were picked
    n, c, e = 5, 6, 6
    embeddings = np.tile(np.eye(c, e, dtype=np.float32)[None], (n, 1, 1))
    images = np.zeros((n, 4, 4, 3), np.uint8)
    perm, ostart, ocount = DD.class_tables(np.arange(n) % 2)
    data = DD.DeviceData(jnp.asarray(images), jnp.asarray(embeddings),
                         jnp.asarray(perm), jnp.asarray(ostart),
                         jnp.asarray(ocount))
    w = 3
    for s in range(10):
        emb = np.asarray(DD.sample_batch(
            data, jax.random.PRNGKey(s), 4, 4, w,
            random_crop=False, random_flip=False)["emb"])
        # each row must be the average of exactly w DISTINCT one-hot rows
        counts = emb * w
        np.testing.assert_allclose(counts.sum(1), w, rtol=1e-5)
        assert np.allclose(counts, np.round(counts), atol=1e-4)
        assert ((counts > 0.5).sum(1) == w).all()


def test_sample_stacked_shapes_and_determinism():
    data, *_ = _toy_data()
    key = jax.random.PRNGKey(3)
    a = DD.sample_stacked(data, key, 2, 8, 12, 2, True, True)
    b = DD.sample_stacked(data, key, 2, 8, 12, 2, True, True)
    assert a["real"].shape == (2, 8, 12, 12, 3)
    assert a["emb"].shape == (2, 8, 8) and a["emb"].dtype == jnp.float32
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    c = DD.sample_stacked(data, jax.random.PRNGKey(4), 2, 8, 12, 2, True, True)
    assert (np.asarray(c["real"]) != np.asarray(a["real"])).any()


def test_stage_from_synthetic_and_nbytes():
    ds = SyntheticDataset(num_examples=32, image_size=16, embed_dim=8)
    data = DD.stage(ds)
    assert data.images.shape == (32, 16, 16, 3)
    assert DD.nbytes(ds) == 32 * 16 * 16 * 3 + 32 * 5 * 8 * 4 + 3 * 4 * 32


def test_resident_step_runs_and_replays_exactly():
    from text_to_image_tpu.train.steps import (init_train_state,
                                               make_resident_step)
    cfg = tiny_config("gancls")
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, g_steps=1))
    ds = SyntheticDataset(num_examples=32, image_size=cfg.data.image_size,
                          embed_dim=cfg.gan.embed_dim)
    data = DD.stage(ds)
    step = make_resident_step(cfg, steps_per_epoch=4)

    def run():
        ts = init_train_state(jax.random.PRNGKey(0), cfg, 4)
        outs = []
        for _ in range(3):
            ts, m = step(ts, data)
            outs.append({k: float(v) for k, v in m.items()})
        return ts, outs

    ts1, m1 = run()
    ts2, m2 = run()
    assert int(np.asarray(ts1.step)) == 3
    assert all(np.isfinite(list(m.values())).all() for m in m1)
    # pure function of (state, staged data): exact replay
    assert m1 == m2


def test_trainer_auto_selects_resident_and_trains(tmp_path):
    from text_to_image_tpu.parallel.mesh import create_mesh
    from text_to_image_tpu.train.trainer import Trainer
    cfg = tiny_config("gancls")
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"), sample_dir=str(tmp_path / "s"),
        log_dir=str(tmp_path / "l"),
        train=dataclasses.replace(cfg.train, summary_interval=2,
                                  snapshot_interval=10**9,
                                  sample_interval=10**9, g_steps=1))
    env = create_mesh(data=8, model=1)
    t = Trainer(cfg, env=env)
    try:
        assert t.device_data is not None and t.pipeline is None
        t.train(num_steps=2)
        assert int(np.asarray(t.ts.step)) == 2
    finally:
        t.close()


def test_trainer_off_uses_pipeline(tmp_path):
    from text_to_image_tpu.parallel.mesh import create_mesh
    from text_to_image_tpu.train.trainer import Trainer
    cfg = tiny_config("gancls")
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"), sample_dir=str(tmp_path / "s"),
        log_dir=str(tmp_path / "l"),
        data=dataclasses.replace(cfg.data, device_resident="off"))
    env = create_mesh(data=8, model=1)
    t = Trainer(cfg, env=env)
    try:
        assert t.device_data is None and t.pipeline is not None
    finally:
        t.close()


def test_sample_stacked_shards_over_mesh_and_matches_unsharded():
    """Multi-chip resident path: with the dataset replicated and the batch
    constrained to the mesh data axis, the sampled values must equal the
    unconstrained single-device sample (sharding changes placement, not
    content), and the output must actually be sharded."""
    import jax
    from text_to_image_tpu.parallel.mesh import create_mesh
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    env = create_mesh(data=8, model=1)
    data, *_ = _toy_data()
    data_repl = jax.device_put(data, env.replicated())
    key = jax.random.PRNGKey(11)

    ref = jax.jit(lambda d, k: DD.sample_stacked(
        d, k, 2, 16, 12, 2, True, True))(data, key)
    sharded = jax.jit(lambda d, k: DD.sample_stacked(
        d, k, 2, 16, 12, 2, True, True, env))(data_repl, key)
    for name in ref:
        np.testing.assert_array_equal(np.asarray(ref[name]),
                                      np.asarray(sharded[name]), err_msg=name)
    # the batch axis (axis 1) is genuinely split over the data axis
    shard_shapes = {s.data.shape for s in sharded["real"].addressable_shards}
    assert shard_shapes == {(2, 2, 12, 12, 3)}
