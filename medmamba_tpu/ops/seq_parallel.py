"""Sequence-parallel selective scan: shard L over a mesh axis.

MedMamba itself never needs this (the longest stage is L=3136 and the scan
state is a tiny (d_inner, d_state) carry -- SURVEY S5 "long-context"), but it
is the natural TPU scaling mechanism for higher-resolution medical scans
(1024^2 pathology slides -> L=65k per direction): shard the sequence over a
mesh axis, run the fused local scan per shard, and stitch shards with an
O(n_shards) boundary combine instead of a serial dependency.

Mechanism (impl-agnostic -- works on top of the Pallas kernel or the XLA
impls, no kernel changes):

  1. each shard s scans its local slice from state 0:
         y_loc, h_last_s = scan(u_s, ...)            (the existing kernels)
  2. per-position decay prefixes P_t = prod_{r<=t} exp(A dt_r) are a local
     cumprod -- decays lie in (0, 1], so the product only UNDERFLOWS to 0
     (mathematically benign: fully-decayed incoming state), never overflows;
     no CLIP machinery is needed, unlike the kernel's factored exponentials.
  3. one all_gather of the (n_shards, B, D, N) boundary summaries
     (h_last_s and the shard's total decay T_s) rides ICI; every shard
     locally forms its incoming state
         h_in_s = sum_{r<s} (prod_{r<q<s} T_q) h_last_r
  4. the correction is a rank-1 update per position:
         y_t += sum_n C_t[n] * P_t[n] * h_in[n]

Cost: the local scan + one cube pass (steps 2/4) + an O(S * B*D*N)
all_gather -- near-linear speedup in the number of sequence shards for long
L. Forward scans only at this layer (SS2D owns direction handling; a
reversed direction is the same machinery on the flipped sequence).

Reference semantics: /root/reference/MedMamba.py:273-279 (selective_scan_fn);
this module adds distribution the reference lacks (SURVEY S2.7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _local_scan(u, delta, A, B, C, D, delta_bias, delta_softplus, impl):
    """The per-shard scan, dispatched directly (the public selective_scan
    wrapper would try to shard_map the Pallas kernel over the active mesh --
    we are already inside a shard_map here)."""
    if impl == "pallas":
        from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

        return selective_scan_pallas(
            u, delta, A, B, C, D, delta_bias=delta_bias,
            delta_softplus=delta_softplus, return_last_state=True)
    from medmamba_tpu.ops.selective_scan import (selective_scan_assoc,
                                                 selective_scan_seq)

    fn = selective_scan_seq if impl == "seq" else selective_scan_assoc
    return fn(u, delta, A, B, C, D, delta_bias=delta_bias,
              delta_softplus=delta_softplus, return_last_state=True)


def _scan_and_stitch(u, delta, A, B, C, D, delta_bias, *,
                     delta_softplus: bool, impl: str, axis_name: str):
    y_loc, h_last = _local_scan(u, delta, A, B, C, D, delta_bias,
                                delta_softplus, impl)

    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias[None, :, None].astype(jnp.float32)
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    # P_t = prod_{r<=t} exp(A dt_r), as a LINEAR-space cumprod of per-step
    # decays in (0, 1]: long shards underflow toward 0 (correct limit)
    # instead of overflowing the way exp(raw cumsum) would.
    a = jnp.exp(A[None, :, :, None] * dt[:, :, None, :])   # (b, d, n, l)
    prefix = jnp.cumprod(a, axis=-1)

    idx = jax.lax.axis_index(axis_name)
    n_sh = jax.lax.axis_size(axis_name)
    # boundary summaries: (S, b, d, n) -- tiny next to the scan itself
    h_all = jax.lax.all_gather(h_last.astype(jnp.float32), axis_name)
    t_all = jax.lax.all_gather(prefix[..., -1], axis_name)

    # exclusive prefix-combine for THIS shard's incoming state, plus the
    # identical full combine on every shard for the (replicated) final state
    def step(r, carry):
        h_in, h_fin = carry
        upd = t_all[r] * h_in + h_all[r]
        return (jnp.where(r < idx, upd, h_in),
                t_all[r] * h_fin + h_all[r])

    zero = jnp.zeros_like(h_all[0])
    h_in, h_final = jax.lax.fori_loop(0, n_sh, step, (zero, zero))

    b, d, n, l = prefix.shape
    g = C.shape[1]
    prefix_g = prefix.reshape(b, g, d // g, n, l)
    hin_g = h_in.reshape(b, g, d // g, n)
    corr = jnp.einsum("bgnl,bgdnl,bgdn->bgdl", C.astype(jnp.float32),
                      prefix_g, hin_g).reshape(b, d, l)

    y = (y_loc.astype(jnp.float32) + corr).astype(y_loc.dtype)
    return y, h_final


def selective_scan_seq_parallel(
        u, delta, A, B, C, D=None, delta_bias=None,
        delta_softplus: bool = False, *, mesh, seq_axis: str,
        impl: str = "auto", return_last_state: bool = False):
    """Selective scan with L sharded over ``mesh`` axis ``seq_axis``.

    Arguments follow ``selective_scan`` (forward direction): ``u``/``delta``
    (B, D, L), ``B``/``C`` (B, G, N, L), L divisible by the axis size.
    Returns y (B, D, L) sharded the same way (plus the exact final state,
    replicated, when ``return_last_state``).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"
    d = delta.shape[1]
    Dv = jnp.zeros((d,), jnp.float32) if D is None else D
    bias = jnp.zeros((d,), jnp.float32) if delta_bias is None else delta_bias

    from medmamba_tpu.parallel.mesh import shard_map_compat

    seq, seq4, rep = P(None, None, seq_axis), P(None, None, None, seq_axis), P()
    fn = shard_map_compat(
        partial(_scan_and_stitch, delta_softplus=delta_softplus,
                impl=impl, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(seq, seq, rep, seq4, seq4, rep, rep),
        out_specs=(seq, rep))
    y, h_final = fn(u, delta, A, B, C, Dv, bias)
    return (y, h_final) if return_last_state else y
