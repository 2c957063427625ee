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


# --------------------- sharded-resident middle tier -------------------------


class _ArrDS:
    def __init__(self, n=64, src=12, c=3, e=8, classes=4, seed=0):
        rng = np.random.default_rng(seed)
        self.images = rng.integers(0, 256, (n, src, src, 3), dtype=np.uint8)
        self.embeddings = rng.normal(size=(n, c, e)).astype(np.float32)
        self.class_ids = (np.arange(n) % classes).astype(np.int32)

    @property
    def num_examples(self):
        return len(self.images)

    def test_embeddings(self, n=None):
        embs = self.embeddings[:n] if n else self.embeddings
        return embs[:, 0, :]

    def spawn(self, seed):
        import copy
        clone = copy.copy(self)
        clone._rng = np.random.default_rng(seed)
        return clone

    def next_batch(self, batch_size, window=4):
        rng = getattr(self, "_rng", None) or np.random.default_rng(0)
        idx = rng.integers(0, self.num_examples, batch_size)
        wrong = (idx + 1 + rng.integers(0, self.num_examples - 2,
                                        batch_size)) % self.num_examples
        return {"real": self.images[idx], "wrong": self.images[wrong],
                "emb": self.embeddings[idx].mean(axis=1)}


def _mesh8():
    from text_to_image_tpu.parallel.mesh import create_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return create_mesh(data=8, model=1)


def test_stage_sharded_layout_and_tables():
    """Each shard owns N/D contiguous rows, its class tables index within
    the shard, and every row is a real example of the dataset."""
    env = _mesh8()
    ds = _ArrDS(n=60)  # not divisible by 8 -> wrap-padded to 64
    data = DD.stage_sharded(ds, env, seed=3)
    d, nl = data.class_perm.shape
    assert d == 8 and nl == 8  # ceil(60/8)
    assert data.images.shape == (64, 12, 12, 3)
    imgs = np.asarray(data.images)
    # every staged row must be one of the dataset's images
    orig = {a.tobytes() for a in ds.images}
    assert all(r.tobytes() in orig for r in imgs)
    # per-shard tables are valid: perm is a permutation of [0, nl)
    for s in range(d):
        assert sorted(np.asarray(data.class_perm[s])) == list(range(nl))
    # dim 0 genuinely sharded over the mesh
    shapes = {sh.data.shape for sh in data.images.addressable_shards}
    assert shapes == {(8, 12, 12, 3)}


def test_sample_stacked_sharded_semantics_and_determinism():
    """Device d's slice of the batch must come from shard d's examples, the
    wrong image's class must differ from the matched one, and the same key
    must replay the identical batch (exact resumability)."""
    env = _mesh8()
    ds = _ArrDS(n=64, src=12, classes=4)
    data = DD.stage_sharded(ds, env, seed=0)
    key = jax.random.PRNGKey(5)
    k, b, size, window = 2, 32, 12, 2  # no crop (src == size) for identity

    f = jax.jit(lambda d_, k_: DD.sample_stacked_sharded(
        d_, k_, k, b, size, window, False, False, env))
    batch = f(data, key)
    assert batch["real"].shape == (k, b, 12, 12, 3)
    assert batch["emb"].shape == (k, b, 8)
    # sharded over the data axis on the batch dim
    shapes = {sh.data.shape for sh in batch["real"].addressable_shards}
    assert shapes == {(2, 4, 12, 12, 3)}

    # identify each served image's source row by byte-equality
    imgs = np.asarray(data.images)
    row_of = {imgs[i].tobytes(): i for i in range(len(imgs))}
    nl = len(imgs) // 8
    real = np.asarray(batch["real"])
    wrong = np.asarray(batch["wrong"])
    staged_cls = np.asarray([  # class of each staged row, via byte lookup
        ds.class_ids[np.nonzero([r.tobytes() == im.tobytes()
                                 for im in ds.images])[0][0]]
        for r in imgs])
    for ki in range(k):
        for bi in range(b):
            shard = bi // (b // 8)
            r_row = row_of[real[ki, bi].tobytes()]
            w_row = row_of[wrong[ki, bi].tobytes()]
            # locality: both draws stay inside the device's own shard
            assert shard * nl <= r_row < (shard + 1) * nl
            assert shard * nl <= w_row < (shard + 1) * nl
            # matching-aware semantics: wrong is a different class
            assert staged_cls[r_row] != staged_cls[w_row]

    # exact replay
    batch2 = f(data, key)
    for name in batch:
        np.testing.assert_array_equal(np.asarray(batch[name]),
                                      np.asarray(batch2[name]), err_msg=name)
    # a different key gives a different draw
    batch3 = f(data, jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(batch3["real"]),
                              np.asarray(batch["real"]))


def test_resident_step_runs_on_sharded_data():
    """make_resident_step dispatches on the pytree type and trains on the
    sharded tier with finite metrics."""
    from text_to_image_tpu.train.steps import (init_train_state,
                                               make_resident_step)
    from text_to_image_tpu.utils import prng
    from text_to_image_tpu.parallel.mesh import replicated

    env = _mesh8()
    cfg = tiny_config("gancls")
    ds = _ArrDS(n=64, src=19, e=cfg.gan.embed_dim, classes=4)
    data = DD.stage_sharded(ds, env, seed=0)
    ts = init_train_state(prng.base_key(0), cfg, 4)
    ts = replicated(env, ts)
    step = make_resident_step(cfg, 4, env)
    ts, m = step(ts, data)
    ts, m = step(ts, data)
    assert int(jax.device_get(ts.step)) == 2
    for name, v in m.items():
        assert np.isfinite(float(v)), name


def test_trainer_auto_selects_sharded_when_split_exceeds_chip_budget(
        tmp_path, monkeypatch):
    """auto: split bigger than the per-chip budget but fitting in aggregate
    -> sharded tier; budget 0 -> host pipeline; explicit sharded unchanged."""
    from text_to_image_tpu.train.trainer import Trainer
    env = _mesh8()
    cfg = tiny_config("gancls")
    ds = _ArrDS(n=64, src=19, e=cfg.gan.embed_dim, classes=4)
    cfg = cfg.replace(
        checkpoint_dir=str(tmp_path / "ck"), sample_dir=str(tmp_path / "s"),
        log_dir=str(tmp_path / "l"),
        train=dataclasses.replace(cfg.train, batch_size=8),
        data=dataclasses.replace(cfg.data, resident_budget_mb=0))
    # budget 0: nothing fits -> host pipeline even in aggregate
    t = Trainer(cfg, dataset=ds, env=env)
    try:
        assert t.pipeline is not None
    finally:
        t.close()
    # auto + split that exceeds the per-chip budget but fits over the 8
    # batch-axis devices -> sharded tier (pretend the split is 5 MB vs a
    # 1 MB chip budget; 5 <= 8x1 in aggregate)
    monkeypatch.setattr(DD, "nbytes", lambda _ds: 5 * 2**20)
    cfg_auto = cfg.replace(data=dataclasses.replace(
        cfg.data, resident_budget_mb=1, device_resident="auto"))
    t_auto = Trainer(cfg_auto, dataset=ds, env=env)
    try:
        assert isinstance(t_auto.device_data, DD.ShardedDeviceData)
        assert t_auto.pipeline is None
        t_auto.train(num_steps=1)
        assert int(jax.device_get(t_auto.ts.step)) == 1
    finally:
        t_auto.close()
    # explicit sharded mode stages the sharded tier and trains
    cfg2 = cfg.replace(data=dataclasses.replace(cfg.data,
                                                device_resident="sharded"))
    t2 = Trainer(cfg2, dataset=ds, env=env)
    try:
        assert isinstance(t2.device_data, DD.ShardedDeviceData)
        t2.train(num_steps=1)
        assert int(jax.device_get(t2.ts.step)) == 1
    finally:
        t2.close()
