"""Checkpoint save/restore (Orbax) with the reference's layout semantics.

The reference writes per-part dicts {epoch, iteration, <part> state_dicts,
optimizer_<part> state_dicts} every CHECKPOINT_PERIOD epochs, rank-0 only,
named ``{Prefix}-{epoch}.pth`` (aspp_trainer.py:46-55,129-131,
gald_trainer.py:26-35).  Here a checkpoint is an Orbax directory
``{Prefix}-{epoch}`` holding the TrainState pytree (params + stats +
optimizer states per module) plus {epoch, iteration} metadata; resume
restores everything including the step counter (aspp_trainer.py:28-44).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train.state import ModuleState, TrainState


def _to_pytree(state: TrainState, epoch: int) -> Dict[str, Any]:
    return {
        "epoch": epoch,
        "iteration": int(state.step),
        "modules": {
            name: {"params": m.params, "stats": m.stats, "opt_state": m.opt_state}
            for name, m in state.modules.items()
        },
    }


_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _checkpointer() -> ocp.StandardCheckpointer:
    """One shared (async-capable) checkpointer so in-flight saves can be
    awaited from anywhere (`wait_for_checkpoints`).

    Under jax.distributed (process_count > 1) Orbax's default save is a
    COLLECTIVE: it barriers across all processes, so the Trainer's
    rank-0-only save deadlocks — rank 0 waits on a sync the other ranks
    never join (found by the 2-process preemption drill,
    tests/test_multiprocess.py::test_two_process_preemption_resume; the
    single-process drill could not see it).  The trees we save are already
    host-fetched numpy (``jax.device_get`` in save_checkpoint), so the save
    needs no cross-process data — restrict the barrier set to rank 0.
    """
    global _CKPTR
    if _CKPTR is None:
        if jax.process_count() > 1:
            _CKPTR = ocp.StandardCheckpointer(
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    primary_host=0, active_processes={0},
                    barrier_sync_key_prefix="segtpu_rank0_ckpt"))
        else:
            _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


_RESTORER: Optional[ocp.StandardCheckpointer] = None


def _restore_checkpointer() -> ocp.StandardCheckpointer:
    """Restores run on EVERY rank (each process rebuilds the replicated
    state), so they must not go through the rank-0-restricted save
    instance; reads of numpy trees are local and barrier-free."""
    if jax.process_count() <= 1:
        return _checkpointer()
    global _RESTORER
    if _RESTORER is None:
        _RESTORER = ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
                barrier_sync_key_prefix=(
                    f"segtpu_restore_p{jax.process_index()}")))
    return _RESTORER


def save_checkpoint(path: str, state: TrainState, epoch: int,
                    wait: bool = True) -> str:
    """Save; with ``wait=False`` the host->disk serialization runs in the
    background (Orbax async) and training continues — the device->host fetch
    (`jax.device_get`) still happens eagerly so the saved state is a
    consistent snapshot of *this* step.  Call ``wait_for_checkpoints()``
    before reading the checkpoint back or exiting."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(_to_pytree(state, epoch)), force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints() -> None:
    """Block until all async `save_checkpoint(..., wait=False)` complete."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def load_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Restore into the structure of `state`; returns (state, start_epoch)."""
    wait_for_checkpoints()  # a just-written async ckpt must be finalized
    path = os.path.abspath(path)
    ckptr = _restore_checkpointer()
    template = _to_pytree(state, 0)
    restored = ckptr.restore(path, template)
    modules = {
        name: ModuleState(params=m["params"], stats=m["stats"],
                          opt_state=m["opt_state"])
        for name, m in restored["modules"].items()
    }
    new_state = TrainState(
        modules=modules,
        step=np.asarray(restored["iteration"], np.int32))
    return new_state, int(restored["epoch"]) + 1


def load_checkpoint_variables(path: str,
                              module_names=None) -> Tuple[Dict[str, Any], int]:
    """Structure-free restore of params+stats only (no optimizer state).

    Reads ANY checkpoint written by ``save_checkpoint`` regardless of which
    modules it contains — in particular a FADA checkpoint's extra ``model_D``
    when evaluating just the segmentor, matching the reference testers
    loading the combined 6-state-dict ``.pth`` (aspp_tester.py:25-31,
    aspp_fada.py:29-40).

    Returns ({module: {"params", **stats}}, saved_epoch).  NOTE: the second
    element is the epoch the checkpoint was SAVED at — unlike
    ``load_checkpoint``, which returns the resume START epoch (saved+1).
    Callers resuming training from this path must add 1 themselves."""
    wait_for_checkpoints()
    restored = _restore_checkpointer().restore(os.path.abspath(path))
    out = {}
    for name, m in restored["modules"].items():
        if module_names is not None and name not in module_names:
            continue
        out[name] = {"params": m["params"], **(m.get("stats") or {})}
    return out, int(restored["epoch"])


def checkpoint_name(output_dir: str, prefix: str, epoch: int) -> str:
    return os.path.join(output_dir, f"{prefix}-{epoch}")


def prune_checkpoints(output_dir: str, prefix: str, keep: int) -> None:
    """Keep only the newest ``keep`` checkpoints of ``prefix``.

    ``keep < 0`` keeps all; ``keep == 0`` deletes all.  The trainer prunes
    to ``max(KEEP_CHECKPOINTS - 1, 1)`` before each save so retention lands
    at KEEP_CHECKPOINTS after the save completes while never dropping below
    one complete checkpoint (no zero-checkpoint preemption window)."""
    if keep < 0 or not os.path.isdir(output_dir):
        return
    import shutil

    found = []
    for entry in os.listdir(output_dir):
        m = re.fullmatch(rf"{re.escape(prefix)}-(\d+)", entry)
        if m:
            found.append((int(m.group(1)), entry))
    doomed = sorted(found)[:-keep] if keep > 0 else sorted(found)
    for _, entry in doomed:
        shutil.rmtree(os.path.join(output_dir, entry), ignore_errors=True)


def latest_checkpoint(output_dir: str, prefix: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    best = None
    best_ep = -1
    for entry in os.listdir(output_dir):
        m = re.fullmatch(rf"{re.escape(prefix)}-(\d+)", entry)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = os.path.join(output_dir, entry)
    return best
