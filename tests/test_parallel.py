"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4): the
data-parallel program must produce the same results as single-device
execution on the full batch — GSPMD semantics, including global-batch BN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from text_to_image_tpu.parallel.mesh import create_mesh, replicated
from text_to_image_tpu.train.steps import init_train_state, make_train_step
from text_to_image_tpu.utils import prng
from tests.helpers import make_batch, tiny_config


def test_mesh_shapes():
    env = create_mesh(data=4, model=2)
    assert env.data_size == 4 and env.model_size == 2
    assert env.slice_size == 1
    env2 = create_mesh(model=2)  # data=-1 → all remaining
    assert env2.data_size * 2 == len(jax.devices())
    with pytest.raises(ValueError):
        create_mesh(data=3, model=3)

    env3 = create_mesh(slices=2, model=1)  # (slice=2, data=4, model=1)
    assert env3.slice_size == 2 and env3.data_size == 4
    assert env3.mesh.axis_names == ("slice", "data", "model")
    with pytest.raises(ValueError):
        create_mesh(slices=3)  # 8 % 3 != 0


def test_multislice_dp_matches_single_device():
    """Hierarchical DP over a (slice, data) mesh — the DCN-aware layout —
    must match single-device training on the global batch (same equivalence
    contract as plain DP; tolerances per test_dp_matches_single_device)."""
    cfg = tiny_config("gancls")
    lr = cfg.train.generator_lr

    def run(env):
        ts = init_train_state(prng.base_key(0), cfg)
        step = make_train_step(cfg)
        metrics = []
        for i in range(2):
            batch = make_batch(cfg, seed=i)
            if env is not None:
                ts = replicated(env, ts) if i == 0 else ts
                batch = jax.device_put(batch, env.stacked_batch())
            ts, m = step(ts, batch)
            metrics.append({k: float(v) for k, v in m.items()})
        return ts, metrics

    ts1, m1 = run(None)
    ts2, m2 = run(create_mesh(slices=2, data=2, model=2))

    for s, (a, b) in enumerate(zip(m1, m2)):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-3, atol=1e-4,
                                       err_msg=f"step {s} metric {k} diverged")
    for x, y in zip(jax.tree.leaves(jax.device_get(ts1.g_params)),
                    jax.tree.leaves(jax.device_get(ts2.g_params))):
        np.testing.assert_allclose(x, y, atol=10 * lr)


def test_dp_matches_single_device():
    """DP must be *numerically* equivalent to single-device on the global
    batch: identical program semantics, differing only by cross-device
    reduction-order rounding (Adam can turn ~1e-7 gradient noise into
    ~lr-sized param deltas, so the check is loss trajectories over steps plus
    a param bound of a few lr quanta — not bitwise params)."""
    cfg = tiny_config("gancls")
    lr = cfg.train.generator_lr

    def run(env):
        ts = init_train_state(prng.base_key(0), cfg)
        step = make_train_step(cfg)
        metrics = []
        for i in range(3):
            batch = make_batch(cfg, seed=i)
            if env is not None:
                ts = replicated(env, ts) if i == 0 else ts
                batch = jax.device_put(
                    batch, NamedSharding(env.mesh, P(None, "data")))
            ts, m = step(ts, batch)
            metrics.append({k: float(v) for k, v in m.items()})
        return ts, metrics

    ts1, m1 = run(None)
    ts2, m2 = run(create_mesh(data=8, model=1))

    for s, (a, b) in enumerate(zip(m1, m2)):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-3, atol=1e-4,
                                       err_msg=f"step {s} metric {k} diverged")
    for x, y in zip(jax.tree.leaves(jax.device_get(ts1.g_params)),
                    jax.tree.leaves(jax.device_get(ts2.g_params))):
        np.testing.assert_allclose(x, y, atol=10 * lr)


def test_dp_wgan_gp_compiles_and_runs():
    """The GP double-backprop under batch sharding is the compile-critical
    path (SURVEY.md §7 hard part #1)."""
    cfg = tiny_config("wgancls", n_critic=2, g_steps=1, beta1=0.0)
    env = create_mesh(data=8, model=1)
    ts = replicated(env, init_train_state(prng.base_key(0), cfg))
    batch = jax.device_put(make_batch(cfg),
                           NamedSharding(env.mesh, P(None, "data")))
    ts, metrics = make_train_step(cfg)(ts, batch)
    assert np.isfinite(float(metrics["gp"]))
    assert np.isfinite(float(metrics["w_dist"]))


@pytest.mark.slow
def test_tensor_parallel_stem_sharding():
    """Generator stem weights sharded over the model axis still produce the
    replicated-math result."""
    cfg = tiny_config("gancls")
    batch = make_batch(cfg)

    ts_ref = init_train_state(prng.base_key(0), cfg)
    _, m_ref = make_train_step(cfg)(ts_ref, batch)

    env = create_mesh(data=4, model=2)
    ts = init_train_state(prng.base_key(0), cfg)
    cols = NamedSharding(env.mesh, P(None, "model"))
    repl = env.replicated()

    def place(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "stem" in keys and keys[-1] == "w":
            return jax.device_put(leaf, cols)
        return jax.device_put(leaf, repl)

    ts = ts.replace(
        g_params=jax.tree_util.tree_map_with_path(place, ts.g_params),
        g_state=jax.device_put(ts.g_state, repl),
        d_params=jax.device_put(ts.d_params, repl),
        d_state=jax.device_put(ts.d_state, repl),
        g_opt=jax.device_put(ts.g_opt, repl),
        d_opt=jax.device_put(ts.d_opt, repl),
        step=jax.device_put(ts.step, repl),
        aux=ts.aux)
    sharded = jax.device_put(batch, NamedSharding(env.mesh, P(None, "data")))
    _, m = make_train_step(cfg)(ts, sharded)
    for k in m_ref:
        # d_* metrics come from pristine params → only partial-sum rounding;
        # g_* metrics are computed AFTER the D Adam update, where ~1e-7 grad
        # noise becomes ~lr-sized param deltas → %-level loss shifts
        rtol = 5e-3 if k.startswith("d_") else 5e-2
        np.testing.assert_allclose(float(m_ref[k]), float(m[k]), rtol=rtol,
                                   atol=1e-4,
                                   err_msg=f"metric {k} diverged under TP")


@pytest.mark.slow   # the driver exercises this entry point separately
def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.slow   # the driver compile-checks entry() separately
def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None
