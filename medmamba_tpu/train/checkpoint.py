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
# Crash-safe lifecycle: saves land in <path>.tmp and are *promoted* to <path>
# only after the (possibly async) write committed; deletions of superseded
# checkpoints are likewise deferred until the replacement committed. A crash
# at any point leaves at least one complete checkpoint directory on disk.
_PENDING_PROMOTES: list = []   # (tmp_path, final_path)
_PENDING_DELETES: list = []


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def _finalize_pending() -> None:
    while _PENDING_PROMOTES:
        tmp, final = _PENDING_PROMOTES.pop(0)
        old = final + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)  # keep the previous version until committed
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)
    while _PENDING_DELETES:
        p = _PENDING_DELETES.pop(0)
        for cand in (p, p + ".tmp", p + ".old"):
            if cand and os.path.exists(cand):
                shutil.rmtree(cand)


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save completes, then promote
    committed saves to their final paths and apply deferred deletions."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _finalize_pending()


def save_checkpoint(path: str, state, *, epoch: int, best_acc: float,
                    num_classes: int, class_indices: Dict,
                    async_save: bool = True) -> None:
    """Save a training checkpoint directory at ``path`` (overwrites).

    Saves are asynchronous by default (orbax AsyncCheckpointer): the device
    arrays are snapshotted to host, then serialization overlaps with the next
    epoch's compute instead of stalling the step loop (the reference's
    torch.save is synchronous; at small-epoch scales the save dominated the
    epoch). The write goes to ``path + ".tmp"`` and is atomically renamed to
    ``path`` once committed (on the next wait_for_saves/save/restore call), so
    a crash mid-save never destroys the previous checkpoint. Consumers that
    immediately reload should call wait_for_saves().
    """
    path = os.path.abspath(path)
    wait_for_saves()  # one save in flight at a time; drains pending promotes
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if async_save:
        _async_checkpointer().save(os.path.join(tmp, "state"), payload)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.join(tmp, "state"), payload)
    with open(_meta_path(tmp), "w") as f:
        # class_indices is name->idx (NPZ mode) or idx->name (ImageFolder
        # mode, train.py:142-146 layout) -- keep values as-is; coercing them
        # with int() crashed every ImageFolder best-checkpoint save (round-5
        # ImageFolder A/B finding, regression-pinned in tests/test_train.py)
        json.dump({"epoch": int(epoch), "best_acc": float(best_acc),
                   "num_classes": int(num_classes),
                   "class_indices": {str(k): (v if isinstance(v, str)
                                              else int(v))
                                     for k, v in class_indices.items()}}, f,
                  indent=4)
    _PENDING_PROMOTES.append((tmp, path))
    if not async_save:
        _finalize_pending()


def delete_checkpoint_after_commit(path: str) -> None:
    """Defer deletion of a superseded checkpoint until the save that replaces
    it has committed (train.py:321-339 deletes the old best immediately; doing
    that while the new best is still being written would leave a crash window
    with no valid checkpoint)."""
    if path:
        _PENDING_DELETES.append(os.path.abspath(path))


def restore_checkpoint(path: str, state) -> Tuple[Any, Dict]:
    """Restore ``state`` (same structure) + metadata dict from ``path``.

    Mirrors the graceful per-part resume of train.py:208-260: metadata keys that
    are missing fall back to defaults with a warning from the caller.
    """
    path = _resolve_read_path(os.path.abspath(path))
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
    (the analogue of test.py:76-77 / app_streamlit_demo.py:102-116).

    A *file* path (e.g. the reference's published ``.pth`` checkpoints) is
    auto-converted in memory through ``utils.torch_interop.torch_to_flax`` —
    the reference's consumers read the torch dict directly (test.py:76-77,
    app_streamlit_demo.py:102-116), so users holding published weights can
    point evaluate/test/demo straight at them without running cli/convert.
    """
    path = os.path.abspath(path)
    if os.path.isfile(path):
        return _restore_params_pth(path)
    path = _resolve_read_path(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.join(path, "state"))
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return restored, meta


def _restore_params_pth(path: str) -> Tuple[Dict, Dict]:
    """Load a torch checkpoint file with the reference's payload schema
    ({epoch, model_state_dict, best_acc, num_classes, class_indices, ...},
    train.py:310-319) or a bare state_dict, converting weights to the flax
    layout."""
    import torch
    from medmamba_tpu.utils.torch_interop import torch_to_flax

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model_state_dict", payload) \
        if isinstance(payload, dict) else payload
    variables = torch_to_flax(sd)
    meta = {}
    if isinstance(payload, dict):
        meta = {k: payload[k] for k in
                ("epoch", "best_acc", "num_classes", "class_indices")
                if k in payload}
    return {"params": variables["params"],
            "batch_stats": variables["batch_stats"]}, meta


def _resolve_read_path(path: str) -> str:
    """Pick the newest complete checkpoint dir for ``path``: after a crash the
    data may still live at ``path + ".old"`` (promotion interrupted) or
    ``path + ".tmp"`` (committed but never promoted, e.g. killed process)."""
    wait_for_saves()
    if os.path.exists(path):
        return path
    for suffix in (".old", ".tmp"):
        if os.path.exists(path + suffix):
            return path + suffix
    return path


def delete_checkpoint(path: str) -> None:
    for cand in (path, path + ".tmp", path + ".old") if path else ():
        if os.path.exists(cand):
            shutil.rmtree(cand)


def save_class_indices(save_dir: str, class_indices: Dict) -> str:
    p = os.path.join(save_dir, "class_indices.json")
    with open(p, "w") as f:
        json.dump({str(k): v for k, v in class_indices.items()}, f, indent=4)
    return p
