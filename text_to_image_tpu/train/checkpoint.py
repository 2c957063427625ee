"""Checkpointing (rebuild of the reference's ``tf.train.Saver`` flow).

Semantics preserved from SURVEY.md §5.4:
* save every K steps under ``<ckpt_dir>/<model>/<dataset>/``,
* restore-latest-on-start if a checkpoint exists,
* cross-model restore: StackGAN Stage-II loads the Stage-I generator's
  params/state from the Stage-I checkpoint (`load_stage1_generator`).

Implemented on Orbax (atomic, async-capable, TPU-friendly); the saved tree is
the full TrainState (both nets, norm state, both optimizer moments, step), so
resume is bit-exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from text_to_image_tpu.train.state import TrainState


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = False):
        """async_save=True writes in the background (Orbax async) so the
        train loop keeps stepping during snapshots; `close()`/`restore()`
        always wait for in-flight saves."""
        self._dir = _abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save),
        )

    @property
    def directory(self) -> str:
        return self._dir

    def save(self, step: int, ts: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(ts))
        if not self._async:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, ts_like: TrainState, step: Optional[int] = None
                ) -> Tuple[TrainState, Optional[int]]:
        """Restore latest (or `step`) into the structure of `ts_like`.
        Returns (state, restored_step) — (ts_like, None) if nothing saved."""
        self._mgr.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            return ts_like, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, ts_like)
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except (ValueError, KeyError) as e:
            # toggling train.ema_decay between runs adds/removes the
            # aux['ema_g_params'] subtree — reconcile instead of failing
            # (pre-EMA checkpoint into an EMA run backfills from g_params;
            # EMA checkpoint into a non-EMA run drops the averaged copy)
            restored = self._restore_reconciling_ema(abstract, step, e)
        return restored, step

    def _restore_reconciling_ema(self, abstract: TrainState, step: int,
                                 err: Exception) -> TrainState:
        aux = dict(abstract.aux)
        if "ema_g_params" in aux:
            aux.pop("ema_g_params")
            backfill = True
        else:
            aux["ema_g_params"] = abstract.g_params
            backfill = False
        try:
            restored = self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(abstract.replace(aux=aux)))
        except (ValueError, KeyError):
            raise ValueError(
                f"checkpoint at step {step} under {self._dir} does not match "
                f"the current model/config structure (wrong model family, "
                f"image_size, network dims, or train.ema_decay toggled "
                f"between runs?) — point checkpoint_dir at a matching run or "
                f"clear it. Original error:\n{err}") from err
        new_aux = dict(restored.aux)
        if backfill:
            # copy, don't alias: the train step donates the whole state, and
            # aliased buffers trip "donate the same buffer twice"
            import jax.numpy as jnp
            new_aux["ema_g_params"] = jax.tree.map(jnp.copy,
                                                   restored.g_params)
        else:
            new_aux.pop("ema_g_params", None)
        return restored.replace(aux=new_aux)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_stage1_generator(directory: str, ts_like: TrainState
                          ) -> Tuple[Any, Any]:
    """Cross-model restore: pull (g_params, g_state) of a trained Stage-I out
    of its checkpoint, for freezing inside the Stage-II train state."""
    mgr = CheckpointManager(directory)
    restored, step = mgr.restore(ts_like)
    mgr.close()
    if step is None:
        raise FileNotFoundError(f"no Stage-I checkpoint under {directory}")
    # Freeze the EVAL weights: when Stage-I trained with a generator EMA
    # (train.ema_decay > 0), the averaged params are what sampling/eval use
    # (eval/sampler.eval_g_params) — Stage-II should refine those, not the
    # noisier live params.
    return (restored.aux.get("ema_g_params", restored.g_params),
            restored.g_state)
