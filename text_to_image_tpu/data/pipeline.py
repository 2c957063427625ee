"""Host→HBM input pipeline.

The reference calls ``dataset.next_batch`` synchronously inside the train
loop (SURVEY.md §3.1) — on TPU that would stall the device between steps.
Here a background thread assembles numpy batches while the device computes,
and `jax.device_put` with a batch-axis `NamedSharding` moves them to HBM so
each chip receives only its shard.  A small queue keeps `prefetch` batches in
flight (double buffering); with jit's async dispatch the host stays ahead of
the device.

A training *step* may consume several data batches (WGAN n_critic draws a
fresh batch per critic update — SURVEY.md §3.2), so the pipeline can stack
``batches_per_step`` batches on a leading axis.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from text_to_image_tpu.parallel.mesh import MeshEnv


class InputPipeline:
    def __init__(self, dataset, batch_size: int, env: Optional[MeshEnv] = None,
                 window: int = 4, batches_per_step: int = 1,
                 prefetch: int = 2, workers: int = 1):
        if env is not None and batch_size % env.data_size != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by data axis "
                f"{env.data_size}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.window = window
        self.batches_per_step = batches_per_step
        self.env = env
        if env is not None:
            if env.mesh.devices.size == 1:
                # single-device mesh: a trivially-"sharded" put takes a
                # pathological slow path on some platforms (measured 5.8 s vs
                # 84 ms per batch on tunneled dev TPUs) — plain put instead
                self._sharding = env.mesh.devices.reshape(-1)[0]
            else:
                # batch axis (axis 1, after the per-critic stack axis)
                # sharded over the mesh data(+slice) axes
                self._sharding = env.stacked_batch()
        self._q: queue.Queue = queue.Queue(maxsize=max(prefetch, workers))
        self._stop = threading.Event()
        # >1 workers: each gets an independent-RNG view of the dataset
        # (numpy Generators are not thread-safe); batch order across workers
        # is nondeterministic, per-worker streams are deterministic.
        self._threads = []
        for w in range(max(1, workers)):
            ds = (dataset.spawn(0x5EED0 + 7919 * w)
                  if workers > 1 and hasattr(dataset, "spawn") else dataset)
            t = threading.Thread(target=self._worker, args=(ds,), daemon=True)
            t.start()
            self._threads.append(t)

    def _make_step_batch(self, ds) -> Dict[str, np.ndarray]:
        # always stacked [K, B, ...] — the train step scans over the leading
        # per-critic-update axis (K = n_critic; K=1 for the CE families)
        batches = [ds.next_batch(self.batch_size, self.window)
                   for _ in range(self.batches_per_step)]
        return {k: np.stack([b[k] for b in batches]) for k in batches[0]}

    def _worker(self, ds):
        while not self._stop.is_set():
            batch = self._make_step_batch(ds)
            if self.env is not None:
                # device_put in the worker: the host→HBM transfer (a full
                # round-trip on tunneled dev TPUs) overlaps device compute
                # and other workers' transfers instead of serializing on the
                # consumer thread
                batch = jax.device_put(batch, self._sharding)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        for t in self._threads:
            t.join(timeout=2.0)
