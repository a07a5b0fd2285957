"""S6 selective-scan primitives, TPU-native.

The reference links the CUDA op ``mamba_ssm.ops.selective_scan_interface.selective_scan_fn``
(imported at ``MedMamba.py:12``, invoked at ``MedMamba.py:273-279``).  Its call-site
semantics there are:

    u:      (B, KD, L)  float32
    delta:  (B, KD, L)  float32 (pre-bias, pre-softplus)
    A:      (KD, N)     float32, = -exp(A_logs)
    B, C:   (B, K, N, L) float32  -- *grouped*: channel d uses group g = d // (KD // K)
    D:      (KD,)       float32 skip connection
    delta_bias: (KD,)   float32, delta_softplus=True

and the recurrence (per batch, channel d, state n):

    delta'_t = softplus(delta_t + delta_bias)
    h_t      = exp(delta'_t * A) * h_{t-1} + (delta'_t * B_t) * u_t
    y_t      = sum_n C_t[n] * h_t[n] + D * u_t

This module provides three interchangeable implementations:

* ``selective_scan_seq``   -- ``lax.scan`` over L (the numerical reference; O(L) depth).
* ``selective_scan_assoc`` -- ``lax.associative_scan`` over L (O(log L) depth, pure XLA).
* ``selective_scan``       -- public entry point; dispatches to the fused Pallas kernel
                              on TPU (see ``pallas_scan.py``) and to ``assoc`` elsewhere.

All implementations compute in float32 regardless of input dtype, matching the
reference's forced-fp32 scan core (``MedMamba.py:265-271``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus):
    """Common fp32 promotion + delta bias/softplus + group expansion.

    Returns (dA_exp-ready pieces): delta' (B,D,L), Bg/Cg expanded to per-channel
    group view (B, G, N, L) kept grouped -- expansion happens lazily in each impl.
    """
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    if D is not None:
        D = D.astype(jnp.float32)
    return u, delta, A, B, C, D


def selective_scan_seq(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Sequential ``lax.scan`` implementation (numerical ground truth).

    Shapes as in module docstring. Returns y (B, D, L) float32
    (and optionally the final state (B, D, N)).
    """
    u, delta, A, Bm, Cm, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    b, d, l = u.shape
    n = A.shape[1]
    g = Bm.shape[1]
    dpg = d // g

    # (B, D, L, N) pieces, computed lazily inside scan to bound memory:
    # carry h: (B, D, N)
    def step(h, inputs):
        u_t, dt_t, B_t, C_t = inputs  # (B,D), (B,D), (B,G,N), (B,G,N)
        dA = jnp.exp(dt_t[..., None] * A)  # (B, D, N)
        Bx = B_t[:, :, None, :]  # (B, G, 1, N)
        Bx = jnp.broadcast_to(Bx, (b, g, dpg, n)).reshape(b, d, n)
        h = dA * h + (dt_t * u_t)[..., None] * Bx
        Cx = C_t[:, :, None, :]
        Cx = jnp.broadcast_to(Cx, (b, g, dpg, n)).reshape(b, d, n)
        y_t = jnp.sum(h * Cx, axis=-1)  # (B, D)
        return h, y_t

    h0 = jnp.zeros((b, d, n), jnp.float32)
    xs = (
        jnp.moveaxis(u, -1, 0),  # (L, B, D)
        jnp.moveaxis(delta, -1, 0),
        jnp.moveaxis(Bm, -1, 0),  # (L, B, G, N)
        jnp.moveaxis(Cm, -1, 0),
    )
    h_last, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, -1)  # (B, D, L)
    if D is not None:
        y = y + u * D[None, :, None]
    if return_last_state:
        return y, h_last
    return y


def _assoc_combine(e1, e2):
    """First-order linear recurrence combine: (a1,b1) o (a2,b2) = (a1*a2, a2*b1+b2)."""
    a1, b1 = e1
    a2, b2 = e2
    return a1 * a2, a2 * b1 + b2


def selective_scan_assoc(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """``lax.associative_scan`` implementation: O(log L) depth, fully parallel over L.

    Materializes (B, D, L, N) decay/input tensors; intended for moderate sizes and
    as the non-TPU fallback. The Pallas kernel is the production path.
    """
    u, delta, A, Bm, Cm, D = _prepare(u, delta, A, B, C, D, delta_bias, delta_softplus)
    b, d, l = u.shape
    n = A.shape[1]
    g = Bm.shape[1]
    dpg = d // g

    dA = jnp.exp(delta[..., None] * A[None, :, None, :])  # (B, D, L, N)
    Bx = jnp.moveaxis(Bm, -1, 2)  # (B, G, L, N)
    Bx = jnp.broadcast_to(Bx[:, :, None], (b, g, dpg, l, n)).reshape(b, d, l, n)
    dBu = (delta * u)[..., None] * Bx  # (B, D, L, N)

    _, h = jax.lax.associative_scan(_assoc_combine, (dA, dBu), axis=2)
    Cx = jnp.moveaxis(Cm, -1, 2)
    Cx = jnp.broadcast_to(Cx[:, :, None], (b, g, dpg, l, n)).reshape(b, d, l, n)
    y = jnp.sum(h * Cx, axis=-1)  # (B, D, L)
    if D is not None:
        y = y + u * D[None, :, None]
    if return_last_state:
        return y, h[:, :, -1]
    return y


def selective_scan_stub(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    """Shape/dtype-correct NO-OP scan (y = D*u): for benchmarking the
    non-scan remainder of the model (bench.py breakdown) -- NOT a scan."""
    y = u.astype(jnp.float32)
    if D is not None:
        y = y * D.astype(jnp.float32)[None, :, None]
    if return_last_state:
        b, d, _ = u.shape
        return y, jnp.zeros((b, d, A.shape[-1]), jnp.float32)
    return y


IMPLS = {
    "seq": selective_scan_seq,
    "assoc": selective_scan_assoc,
    "stub": selective_scan_stub,
}


def _flip_group_seqs(u, delta, B, C, reverse_dirs):
    """Explicitly flip the sequences of flagged groups along L (the fallback
    realization of ``reverse_dirs`` for impls without a native reverse path).
    """
    if not reverse_dirs or not any(reverse_dirs):
        return u, delta, B, C
    g = B.shape[1]
    d = u.shape[1]
    dpg = d // g

    def flip4(x4):
        parts = [jnp.flip(x4[:, k:k + 1], -1) if f else x4[:, k:k + 1]
                 for k, f in enumerate(reverse_dirs)]
        return jnp.concatenate(parts, axis=1)

    shape_u = u.shape
    u = flip4(u.reshape(u.shape[0], g, dpg, u.shape[-1])).reshape(shape_u)
    delta = flip4(delta.reshape(
        delta.shape[0], g, dpg, delta.shape[-1])).reshape(shape_u)
    return u, delta, flip4(B), flip4(C)


def _flip_y(y, g, reverse_dirs):
    """Flip flagged groups of a (B, G*dpg, L) output back to buffer order."""
    if not reverse_dirs or not any(reverse_dirs):
        return y
    b, d, l = y.shape
    y4 = y.reshape(b, g, d // g, l)
    parts = [jnp.flip(y4[:, k:k + 1], -1) if f else y4[:, k:k + 1]
             for k, f in enumerate(reverse_dirs)]
    return jnp.concatenate(parts, axis=1).reshape(b, d, l)


def _scan_mesh_axes(batch: int):
    """The active multi-device mesh and the axes the scan shards its batch over.

    The scan's parameters (A, D, delta_bias) are tiny; all its cost is
    activation compute, so the kernel parallelizes over *batch* only. Under a
    ("data", "model") mesh the batch is resharded over BOTH axes when
    divisible -- the model axis then does real scan work (each model shard
    computes a distinct batch slice) instead of replicating the kernel, the
    batch-reshard analogue of sequence/context parallelism. GSPMD inserts the
    feature<->batch all-to-alls at the shard_map boundary; they ride ICI and
    are small next to the scan itself (VERDICT r2 weak #5).

    Returns (mesh, axes) or (None, None) if single-device / indivisible.
    """
    from medmamba_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None:
        return None, None
    shape = dict(mesh.shape)
    nd = shape.get("data", 1)
    nm = shape.get("model", 1)
    if nd > 1 and nm > 1 and batch % (nd * nm) == 0:
        return mesh, ("data", "model")
    if nm > 1 and nd <= 1 and batch % nm == 0:
        return mesh, ("model",)
    if nd > 1 and batch % nd == 0:
        return mesh, ("data",)
    return None, None


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    impl: str = "auto",
    reverse_dirs=None,
    tau: Optional[int] = None,
    u_tile: int = 1,
    out_dtype=None,
    valid_len: Optional[int] = None,
):
    """Public selective scan with the reference call-site contract (MedMamba.py:273-279).

    impl: "auto" | "pallas" | "assoc" | "seq".
    "auto" picks the fused Pallas kernel on TPU backends, "assoc" otherwise.

    tau: optional segment length for the Pallas kernel (16/32/64/128; None =
    the MEDMAMBA_SCAN_TAU env default). Larger is faster but exact only while
    |A * seg_sum(dt)| <= 2*CLIP per segment -- use
    ``medmamba_tpu.train.tau_select`` to pick it safely from data. Ignored by
    the non-Pallas impls (they are exact at any magnitude).

    reverse_dirs: optional per-group bools; flagged groups scan right-to-left
    with buffer-order outputs (the Pallas kernel handles this natively via
    reversed index maps -- a False-prefix/True-suffix pattern runs as ONE
    launch with per-group direction branches; other impls flip explicitly).
    This lets SS2D skip materializing the flipped CrossScan copies
    (MedMamba.py:257/:282).

    u_tile: u carries only ``g // u_tile`` groups of channels; scan group k
    reads u group ``k % (g // u_tile)`` (the Pallas kernel does this through
    its index maps with no duplicated HBM buffer; other impls materialize
    the tile). SS2D passes its shared forward/reverse buffers once (u_tile=2).

    out_dtype: y's dtype on the Pallas path (default float32, the reference
    contract; emitting the model's block dtype directly is bit-identical to
    casting after and halves y/gy HBM traffic). Non-Pallas impls return
    fp32 and the caller's cast applies as before.

    valid_len: arrays arrive pre-padded along L to the next multiple of the
    kernel chunk; positions >= valid_len are pad (decay 1 / inject 0, y
    returned at padded length). The Pallas kernel masks natively; other
    impls force the padded delta to -1e4 pre-softplus (dt = 0 exactly), so
    pad positions carry state unchanged in either scan direction.
    """
    if valid_len is not None:
        assert delta_softplus, "valid_len requires delta_softplus semantics"
    if impl == "auto":
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover
            on_tpu = False
        impl = "pallas" if on_tpu else "assoc"
    if impl == "pallas":
        try:
            from medmamba_tpu.ops.pallas_scan import selective_scan_pallas
        except ImportError:
            impl = "assoc"
    if impl == "pallas":
        rflags = tuple(bool(f) for f in reverse_dirs) if reverse_dirs else None
        mesh, axes = _scan_mesh_axes(u.shape[0])
        if mesh is not None:
            # XLA cannot partition a custom call: without this, GSPMD
            # all-gathers the operands and runs the kernel replicated on
            # every device. shard_map keeps it batch-parallel -- over every
            # mesh axis the batch divides (see _scan_mesh_axes).
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from medmamba_tpu.parallel.mesh import shard_map_compat

            body = partial(selective_scan_pallas,
                           delta_softplus=delta_softplus,
                           return_last_state=return_last_state,
                           reverse_dirs=rflags, tau=tau, u_tile=u_tile,
                           out_dtype=out_dtype, valid_len=valid_len)
            dp, rep = P(axes), P()
            fn = shard_map_compat(
                body, mesh=mesh,
                in_specs=(dp, dp, rep, dp, dp, rep, rep),
                out_specs=(dp, dp) if return_last_state else dp)
            d_full = delta.shape[1]
            return fn(u, delta, A, B, C,
                      jnp.zeros((d_full,), jnp.float32) if D is None else D,
                      jnp.zeros((d_full,), jnp.float32)
                      if delta_bias is None else delta_bias)
        return selective_scan_pallas(
            u, delta, A, B, C, D,
            delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            return_last_state=return_last_state,
            reverse_dirs=rflags,
            tau=tau,
            u_tile=u_tile,
            out_dtype=out_dtype,
            valid_len=valid_len,
        )
    if u_tile > 1:
        # non-Pallas impls have no shared-u indexing: materialize the tile
        u = jnp.concatenate([u] * u_tile, axis=1)
    if (valid_len is not None and valid_len < u.shape[-1]
            and impl != "stub"):  # the stub never reads delta
        # force dt = softplus(-1e4 + bias) = 0 at pad positions: state passes
        # through unchanged whichever direction scans them first
        pos = jnp.arange(u.shape[-1])
        delta = jnp.where(pos[None, None, :] < valid_len, delta, -1e4)
    fn = IMPLS[impl]
    if impl == "stub":
        # the stub is an elementwise no-op (y = D*u): flip + unflip would be
        # an identity that costs real `rev` copies, polluting the non-scan
        # benchmark breakdown it exists for
        reverse_dirs = None
    u, delta, B, C = _flip_group_seqs(u, delta, B, C, reverse_dirs)
    out = fn(
        u, delta, A, B, C, D,
        delta_bias=delta_bias,
        delta_softplus=delta_softplus,
        return_last_state=return_last_state,
    )
    if reverse_dirs and any(reverse_dirs):
        if return_last_state:
            return _flip_y(out[0], B.shape[1], reverse_dirs), out[1]
        return _flip_y(out, B.shape[1], reverse_dirs)
    return out
