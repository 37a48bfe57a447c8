"""Sharding-aware checkpointing on Orbax.

Upgrades the reference's per-submodel torch.save of state_dicts
(Model.py:66-75, utils/logging.py:51-59) to full-state checkpoints:
params + optimizer state + step are saved together, so resume continues the
schedule instead of restarting it (the reference never checkpointed
optimizer state — SURVEY.md §5). Orbax handles distributed arrays natively,
so the same API works for sharded params on a mesh.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from wavenet_speech_tpu.training.trainer import TrainState


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


# Open managers for async saves, keyed by abs ckpt_dir: the manager must
# outlive save_checkpoint() so the background write can finish while
# training continues. One mode per directory per process — call
# wait_for_async_saves() before restoring from or sync-saving to a dir
# that has async saves in flight.
_ASYNC_MANAGERS: dict = {}


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    step: Optional[int] = None,
                    max_to_keep: Optional[int] = None,
                    async_save: bool = False) -> int:
    """Save a TrainState under ckpt_dir/<step>/ ; returns the step saved.

    Saving a step that already exists is a no-op (the crash-safe save in the
    CLI's `finally` often re-saves the step the periodic save just wrote;
    orbax would raise StepAlreadyExistsError).

    async_save=True overlaps the disk write with training: orbax's save is
    asynchronous by nature — the sync path here simply waits immediately.
    The async path keeps the manager open, returns once device arrays are
    read back to host, and lets the serialization/write run in background
    (a full-state save of the 247M-param eval config costs ~89 s sync —
    measured round 5. The hideable part is the serialization/disk write;
    the device->host array readback stays synchronous, and through the
    remote-TPU tunnel that readback can dominate, so the win depends on
    where the checkpoint bytes actually flow). The PREVIOUS async save is
    waited on first, so at most one save is in flight and a crash loses at
    most the newest checkpoint (orbax writes to a tmp dir + atomic rename,
    so resume falls back to the last COMPLETE step, same as a mid-save
    kill today). Call wait_for_async_saves() before process exit or
    restore."""
    step = int(state.step) if step is None else int(step)
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": np.asarray(step, np.int32)}
    if async_save:
        key = os.path.abspath(ckpt_dir)
        mgr = _ASYNC_MANAGERS.get(key)
        if mgr is None:
            if not _ASYNC_MANAGERS:  # first async use: flush on clean exit
                import atexit

                atexit.register(wait_for_async_saves)
            mgr = _manager(ckpt_dir, max_to_keep)
            _ASYNC_MANAGERS[key] = mgr
        mgr.wait_until_finished()  # <= one save in flight
        if step in mgr.all_steps():
            return step
        mgr.save(step, args=ocp.args.StandardSave(payload))
        return step
    mgr = _manager(ckpt_dir, max_to_keep)
    if step in mgr.all_steps():
        mgr.close()
        return step
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()
    return step


def wait_for_async_saves(ckpt_dir: Optional[str] = None) -> None:
    """Block until in-flight async saves complete (one dir, or all), then
    close their managers. Idempotent; required before restore/exit when
    async_save was used."""
    keys = ([os.path.abspath(ckpt_dir)] if ckpt_dir
            else list(_ASYNC_MANAGERS))
    for k in keys:
        mgr = _ASYNC_MANAGERS.pop(k, None)
        if mgr is not None:
            mgr.wait_until_finished()
            mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s


def restore_checkpoint(ckpt_dir: str, state_like: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore into the structure (and shardings) of `state_like`.

    `state_like` is a template TrainState (e.g. freshly initialized, possibly
    with sharded arrays) — restored arrays adopt its dtypes/shardings."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    template = {"params": state_like.params, "opt_state": state_like.opt_state,
                "step": np.asarray(0, np.int32)}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=jax.numpy.asarray(restored["step"]))


def save_params(path: str, params: Any) -> None:
    """Single-pytree save (the reference's per-submodel .pt file analogue,
    for export/interop)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_params(path: str, params_like: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), params_like)
    ckptr.close()
    return out
