"""Device mesh + sharding helpers (the distributed layer the reference lacks).

The reference is strictly single-GPU (SURVEY §2.7: device hardcoded ``cuda:0``,
no torch.distributed anywhere). Here scaling is first-class and idiomatic:

* a ``Mesh`` with axes ``("data", "model")``;
* batches sharded over ``data`` (DP) -- XLA inserts the psum gradient reduction
  over ICI automatically;
* optionally, large kernels sharded over ``model`` (TP) via parameter partition
  rules (see ``partition_params``). The default is model=1 (pure DP), which is
  the right regime for these <=40M-parameter models.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# The mesh most recently built by make_mesh. Kernel wrappers consult it:
# XLA cannot partition a pallas_call (a custom call) automatically -- with
# sharded operands GSPMD silently all-gathers and replicates the kernel --
# so the selective-scan wrapper shard_maps itself over the "data" axis when
# a multi-device mesh is active (see ops/selective_scan.py).
_ACTIVE_MESH: Optional[Mesh] = None


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def shard_map_compat(body, *, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax generations: jax>=0.8 ships jax.shard_map with
    check_vma; older releases only have jax.experimental.shard_map with
    check_rep. Single shim so every kernel wrapper behaves the same."""
    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return jax.shard_map(body, check_vma=False, **kw)
    except (AttributeError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map
        return shard_map(body, check_rep=False, **kw)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    dev = np.asarray(devices).reshape(n_data, n_model)
    mesh = Mesh(dev, ("data", "model"))
    set_active_mesh(mesh)
    return mesh


def shard_batch(mesh: Mesh, images, labels, *,
                process_count: Optional[int] = None):
    """Place a host batch onto the mesh, sharded over the data axis.

    Single-process (the default everywhere this environment can run): pads
    the batch up to a multiple of the data-axis size if needed (last partial
    batch; padded examples get label -1, masked out by callers that care)
    and device_puts the global batch.

    Multi-process (a real pod: ``jax.process_count() > 1``): ``images`` /
    ``labels`` are this process's contiguous 1/process_count slice of the
    global batch (the loader's ``process_index``/``process_count`` slicing),
    and the global array is assembled with
    ``jax.make_array_from_process_local_data`` -- no host ever materializes
    the full global batch. Requires the global batch to divide the data axis
    (the loader's pad_to_full guarantees a full static batch).
    """
    if process_count is None:
        process_count = jax.process_count()
    sh_img = NamedSharding(mesh, P("data"))
    sh_lbl = NamedSharding(mesh, P("data"))
    if process_count > 1:
        nd = mesh.shape["data"]
        gb = images.shape[0] * process_count
        assert gb % nd == 0, (
            f"global batch {gb} must divide the data axis {nd} under "
            f"multi-host loading (set a divisible --batch_size)")
        # The loader hands each process a CONTIGUOUS slice of the global
        # batch in process_index order; make_array_from_process_local_data
        # places local shards at the rows addressed by this process's
        # data-axis devices. Those only coincide when the data axis is
        # ordered by process (ADVICE r4): on an interleaved mesh the
        # image/label pairing survives but the "identical to a single-host
        # global batch" ordering claim does not -- refuse rather than
        # silently reorder.
        procs = [d.process_index
                 for d in mesh.devices.reshape(-1, mesh.shape["model"])[:, 0]]
        assert procs == sorted(procs), (
            "multi-host shard_batch requires the mesh data axis ordered by "
            f"process_index (got {procs}); build the mesh from "
            "jax.devices() order or reorder devices before make_mesh")
        imgs = jax.make_array_from_process_local_data(
            sh_img, np.ascontiguousarray(images))
        lbls = jax.make_array_from_process_local_data(
            sh_lbl, np.ascontiguousarray(labels))
        return imgs, lbls
    nd = mesh.shape["data"]
    b = images.shape[0]
    if b % nd != 0:
        pad = nd - b % nd
        images = np.concatenate([images, np.repeat(images[-1:], pad, 0)], 0)
        labels = np.concatenate([labels, np.full((pad,), -1, labels.dtype)], 0)
    imgs = jax.device_put(images, sh_img)
    lbls = jax.device_put(labels, sh_lbl)
    return imgs, lbls


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState's arrays across the mesh (pure-DP parameter layout)."""
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state)


# ---------------------------------------------------------------------------
# Tensor-parallel parameter partitioning (optional `model` axis)
# ---------------------------------------------------------------------------

def _spec_for(path: Tuple[str, ...], x) -> P:
    """Partition rule: shard the output features of big kernels over `model`.

    Dense kernels (in, out) -> P(None, 'model'); conv kernels
    (kh, kw, in, out) -> P(None, None, None, 'model'); SS2D per-direction stacks
    (K, ., d_inner) shard d_inner; 1-D / small params replicate.
    """
    name = path[-1] if path else ""
    if name == "kernel" and getattr(x, "ndim", 0) == 2:
        return P(None, "model")
    if name == "kernel" and getattr(x, "ndim", 0) == 4:
        # Conv kernels REPLICATE (round 5, measured on the virtual 4x2 mesh):
        # sharding conv output features over 'model' put every conv
        # activation in a model-sharded layout that meets the scan's
        # batch-over-all-devices shard_map (and MaskedBatchNorm's batched
        # stats) in the BACKWARD, which GSPMD resolves as "Involuntary full
        # rematerialization" (3 per 2-block compile). Explicit
        # with_sharding_constraint hints at those seams made it WORSE (4-6:
        # each forced transition is itself flagged); replicating the conv
        # kernels -- depthwise 3x3s and the (C/2)^2-sized conv-branch 3x3s,
        # small next to the sharded Dense/x_proj/dt_proj stacks -- removes
        # every involuntary remat (tests/test_sharding.py pins zero).
        return P()
    if name == "x_proj_weight":
        return P(None, None, "model")
    if name == "dt_projs_weight":
        return P(None, "model", None)
    if name in ("A_logs",):
        return P("model", None)
    if name in ("Ds",):
        return P("model")
    return P()


def partition_params(params, mesh: Mesh):
    """Apply TP partition rules over the `model` axis (no-op when model=1)."""
    def place(path, x):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        spec = _spec_for(keys, x)
        try:
            return jax.device_put(x, NamedSharding(mesh, spec))
        except ValueError:
            return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
