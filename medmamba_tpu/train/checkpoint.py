"""Orbax checkpointing with the reference's checkpoint lifecycle.

Logical payload parity with the torch ``.pth`` dict (train.py:310-319, :351-360):
{epoch, model params+batch_stats, optimizer state, best_acc, num_classes,
class_indices} plus best-checkpoint save with old-best deletion (train.py:321-339)
and a final "last" checkpoint (train.py:349-362). ``class_indices.json`` sidecar
matches train.py:142-146.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


_ASYNC_CKPTR: Optional["ocp.AsyncCheckpointer"] = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save completes."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(path: str, state, *, epoch: int, best_acc: float,
                    num_classes: int, class_indices: Dict,
                    async_save: bool = True) -> None:
    """Save a training checkpoint directory at ``path`` (overwrites).

    Saves are asynchronous by default (orbax AsyncCheckpointer): the device
    arrays are snapshotted to host, then serialization overlaps with the next
    epoch's compute instead of stalling the step loop (the reference's
    torch.save is synchronous; at small-epoch scales the save dominated the
    epoch). Consumers that immediately reload should call wait_for_saves().
    """
    path = os.path.abspath(path)
    wait_for_saves()  # one save in flight at a time; also makes rmtree safe
    if os.path.exists(path):
        shutil.rmtree(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if async_save:
        _async_checkpointer().save(os.path.join(path, "state"), payload)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "state"), payload)
    with open(_meta_path(path), "w") as f:
        json.dump({"epoch": int(epoch), "best_acc": float(best_acc),
                   "num_classes": int(num_classes),
                   "class_indices": {str(k): int(v)
                                      for k, v in class_indices.items()}}, f,
                  indent=4)


def restore_checkpoint(path: str, state) -> Tuple[Any, Dict]:
    """Restore ``state`` (same structure) + metadata dict from ``path``.

    Mirrors the graceful per-part resume of train.py:208-260: metadata keys that
    are missing fall back to defaults with a warning from the caller.
    """
    path = os.path.abspath(path)
    wait_for_saves()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"), item=template)
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return state, meta


def restore_params(path: str) -> Tuple[Dict, Dict]:
    """Inference-side restore: (params+batch_stats pytree, meta). Used by eval/demo
    (the analogue of test.py:76-77 / app_streamlit_demo.py:102-116)."""
    path = os.path.abspath(path)
    wait_for_saves()
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"))
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return restored, meta


def delete_checkpoint(path: str) -> None:
    if path and os.path.exists(path):
        shutil.rmtree(path)


def save_class_indices(save_dir: str, class_indices: Dict) -> str:
    p = os.path.join(save_dir, "class_indices.json")
    with open(p, "w") as f:
        json.dump({str(k): v for k, v in class_indices.items()}, f, indent=4)
    return p
