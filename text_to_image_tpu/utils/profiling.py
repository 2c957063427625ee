"""Profiling/tracing (SURVEY.md §5.1 — the reference has only wall-clock
prints + TensorBoard; here tracing is first-class since images/sec/chip is
the north-star metric).

* `trace(dir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace (XLA op timeline, HBM, MXU utilization).
* `time_step(fn, *args, iters)` — robust steady-state step timer that syncs
  via a scalar fetch (works on tunneled TPUs where `block_until_ready` does
  not actually block — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(tree) -> None:
    """Force execution to complete: fetch one scalar element to host."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        _ = float(jax.device_get(leaves[0]).ravel()[0])


def time_step(step_fn: Callable, *args, iters: int = 30, warmup: int = 3
              ) -> Dict[str, float]:
    """Times `state, aux = step_fn(state, *rest)`-shaped functions.
    Returns {'ms_per_iter', 'iters_per_sec'}."""
    state, rest = args[0], args[1:]
    for _ in range(warmup):
        state, aux = step_fn(state, *rest)
    _sync(aux)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step_fn(state, *rest)
    _sync(aux)
    dt = time.perf_counter() - t0
    return {"ms_per_iter": dt / iters * 1e3, "iters_per_sec": iters / dt}
