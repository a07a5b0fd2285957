"""Fused S6 selective-scan TPU kernel (Pallas).

Replaces the reference's CUDA ``selective_scan_fn`` (mamba_ssm, called at
``MedMamba.py:273-279``) with a single fused kernel that keeps the whole
recurrence state in VMEM:

  * grid = (d_block, group, batch_block, L_chunk); the L_chunk axis is
    innermost and sequential -- the (B_blk, D_blk, N) recurrence state is
    carried in VMEM scratch across chunks (no HBM round-trip for h);
  * each program processes a (B_blk, D_blk, N, T) cube: delta-bias + softplus,
    discretization ``a = exp(delta (x) A)``, input injection
    ``b = delta*u (x) B``, an O(log T) within-chunk Hillis-Steele scan, carry
    application, the C-contraction and the D skip -- all fused (one read of
    u/delta/B/C, one write of y);
  * the backward pass is a second Pallas kernel running the chunks in reverse,
    recomputing h within each chunk from saved chunk-boundary states and
    propagating the adjoint recurrence ``dh_t = C_t g_t + a_{t+1} dh_{t+1}``
    with a flip-free reverse scan.

All computation is float32 (parity with MedMamba.py:265-271); bf16 inputs are
upcast after load so HBM traffic stays in the input dtype.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pow2ceil(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _interpret() -> bool:
    """Run the kernels in Pallas interpreter mode off-TPU (slow, for testing):
    lets the CPU test suite exercise the exact kernel code paths."""
    if os.environ.get("MEDMAMBA_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return False


def _compute_dtype():
    """Scan-internal compute dtype. float32 by default (parity with the
    reference's forced-fp32 scan core, MedMamba.py:265-271); set
    MEDMAMBA_SCAN_COMPUTE=bfloat16 to trade precision for VPU throughput."""
    return jnp.bfloat16 if os.environ.get(
        "MEDMAMBA_SCAN_COMPUTE") == "bfloat16" else jnp.float32


def _pick_dblk(d: int, budget: int) -> int:
    """Largest divisor of d from the aligned candidates, capped by budget."""
    for cand in (256, 192, 128, 96, 64, 48, 32, 16, 8):
        if cand <= budget and d % cand == 0:
            return cand
    return d


def _pick_blocks(bb: int, dpg: int, n: int, chunk: int,
                 vmem_cube_budget: int = None) -> Tuple[int, int]:
    """(B_blk, D_blk) such that a fp32 (B_blk, D_blk, N, T) cube fits budget."""
    if vmem_cube_budget is None:
        vmem_cube_budget = int(os.environ.get("MEDMAMBA_SCAN_CUBE_BUDGET",
                                              2 * 1024 * 1024))
    elems = vmem_cube_budget // 4
    max_bd = max(elems // (n * chunk), 8)
    for b_blk in (8, 4, 2, 1):
        if bb % b_blk != 0:
            continue
        dblk = _pick_dblk(dpg, max(max_bd // b_blk, 8))
        if b_blk * dblk <= max_bd or b_blk == 1:
            return b_blk, dblk
    return 1, _pick_dblk(dpg, max_bd)


# ---------------------------------------------------------------------------
# Within-chunk scan primitives (Hillis-Steele doubling; Mosaic-friendly,
# unlike lax.associative_scan whose recursion emits 0-width slices)
# ---------------------------------------------------------------------------

def _col(x, idx):
    """x[..., idx] as a static slice (scalar indexing lowers to dynamic_slice,
    which Mosaic does not support)."""
    t = x.shape[-1]
    idx = idx % t
    return jax.lax.slice_in_dim(x, idx, idx + 1, axis=x.ndim - 1)[..., 0]


def _shift_r(x, step, fill):
    """Shift right along the last axis by ``step`` filling with ``fill``."""
    pad = jnp.full(x.shape[:-1] + (step,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-step]], axis=-1)


def _shift_l(x, step, fill):
    pad = jnp.full(x.shape[:-1] + (step,), fill, x.dtype)
    return jnp.concatenate([x[..., step:], pad], axis=-1)


def _fwd_chunk_scan(a, b, n_valid=None, h0=None):
    """Inclusive forward scan of h_t = a_t h_{t-1} + b_t over the last axis.

    The entry state h0 (..., N) is folded into b's first column
    (b_0' = b_0 + a_0 h0), which makes the cumulative-product chain an
    internal detail: its final doubling level is skipped (the last level's
    acc is only consumed by the next x-update, which doesn't exist).

    n_valid limits the doubling depth when only a prefix of the chunk holds
    real data (padded tail is identity, so fewer levels suffice)."""
    T = a.shape[-1]
    span = _pow2ceil(min(T, n_valid or T))
    if h0 is not None:
        b0 = _col(b, 0) + _col(a, 0) * h0
        b = jnp.concatenate([b0[..., None], b[..., 1:]], axis=-1)
    x = b
    acc = a
    step = 1
    while step < span:
        x = x + acc * _shift_r(x, step, 0.0)
        step *= 2
        if step < span:
            acc = acc * _shift_r(acc, step // 2, 1.0)
    return x


def _bwd_chunk_scan(a, q, n_valid=None, carry=None):
    """Reverse scan X_t = q_t + a_{t+1} X_{t+1} (suffix scan, flip-free).

    The next-chunk carry c (= a_T X_T) folds into q's last column
    (q_{T-1}' = q_{T-1} + c), so the suffix-product chain skips its final
    doubling level."""
    T = a.shape[-1]
    span = _pow2ceil(min(T, n_valid or T))
    if carry is not None:
        qT = _col(q, -1) + carry
        q = jnp.concatenate([q[..., :-1], qT[..., None]], axis=-1)
    x = q
    p = _shift_l(a, 1, 1.0)
    step = 1
    while step < span:
        x = x + p * _shift_l(x, step, 0.0)
        step *= 2
        if step < span:
            p = p * _shift_l(p, step // 2, 1.0)
    return x


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                y_ref, st_ref, last_ref, h_scr, *, l_valid: int, chunk: int):
    t = pl.program_id(3)
    nc = pl.num_programs(3)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)

    h0 = h_scr[...]                                   # (B_blk, D_blk, N)
    st_ref[:, 0, 0] = h0                              # state entering chunk t

    cdt = _compute_dtype()
    u = u_ref[:, 0].astype(jnp.float32)               # (B_blk, D_blk, T)
    dt = dt_ref[:, 0].astype(jnp.float32)
    dt = jax.nn.softplus(dt + bias_ref[0, 0, :, :])   # bias (D_blk, 1) bcast
    A = A_ref[0]                                      # (D_blk, N)
    Bc = B_ref[:, 0].astype(cdt)                      # (B_blk, N, T)
    Cc = C_ref[:, 0].astype(cdt)

    a = jnp.exp(dt[:, :, None, :] * A[None, :, :, None]).astype(cdt)
    dbu = ((dt * u).astype(cdt))[:, :, None, :] * Bc[:, None]

    if l_valid % chunk != 0:
        pos = t * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, chunk), 3)
        valid = pos < l_valid
        a = jnp.where(valid, a, jnp.asarray(1.0, cdt))
        dbu = jnp.where(valid, dbu, jnp.asarray(0.0, cdt))

    h = _fwd_chunk_scan(a, dbu, n_valid=l_valid,
                        h0=h0.astype(cdt))
    y = jnp.sum((h * Cc[:, None]).astype(jnp.float32), axis=2)
    y = y + D_ref[0, 0, :, :] * u
    y_ref[:, 0] = y
    # With the depth-limited scan (l_valid < chunk => single chunk), the
    # trailing padded positions are outside the doubling window: take the
    # state at the last VALID position instead of the last column.
    last_idx = (l_valid - 1) if l_valid < chunk else -1
    h_last = _col(h, last_idx).astype(jnp.float32)
    h_scr[...] = h_last

    @pl.when(t == nc - 1)
    def _():
        last_ref[:, 0] = h_last


def _fwd_pallas(u, delta, A, B, C, D, bias, chunk: int, l_valid: int):
    """u/delta: (Bb, G, dpg, Lp); B/C: (Bb, G, N, Lp); A: (G, dpg, N);
    D/bias: (G, dpg). Returns y (fp32), chunk states, last state."""
    bb, g, dpg, lp = u.shape
    n = A.shape[-1]
    nc = lp // chunk
    b_blk, dblk = _pick_blocks(bb, dpg, n, chunk)
    nd = dpg // dblk

    grid = (nd, g, bb // b_blk, nc)
    kernel = functools.partial(_fwd_kernel, l_valid=l_valid, chunk=chunk)

    y, states, last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, t)),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, t)),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, t)),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, t)),
            pl.BlockSpec((1, dblk, n), lambda j, gg, b, t: (gg, j, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, t)),
            pl.BlockSpec((b_blk, 1, 1, dblk, n),
                         lambda j, gg, b, t: (b, gg, t, j, 0)),
            pl.BlockSpec((b_blk, 1, dblk, n),
                         lambda j, gg, b, t: (b, gg, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bb, g, dpg, lp), jnp.float32),
            jax.ShapeDtypeStruct((bb, g, nc, dpg, n), jnp.float32),
            jax.ShapeDtypeStruct((bb, g, dpg, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, dblk, n), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, B, C, A,
      bias.reshape(g, nd, dblk, 1), D.reshape(g, nd, dblk, 1))
    return y, states, last


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                st_ref, gy_ref,
                du_ref, ddt_ref, dB_ref, dC_ref, dA_ref, dbias_ref, dD_ref,
                dh_scr, *, l_valid: int, chunk: int):
    b_id = pl.program_id(2)
    t = pl.program_id(3)
    nc = pl.num_programs(3)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros(dh_scr.shape, dh_scr.dtype)

    @pl.when(jnp.logical_and(b_id == 0, t == 0))
    def _():
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)
        dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)
        dD_ref[...] = jnp.zeros(dD_ref.shape, dD_ref.dtype)

    u = u_ref[:, 0].astype(jnp.float32)                # (B_blk, D_blk, T)
    dt_raw = dt_ref[:, 0].astype(jnp.float32) + bias_ref[0, 0, :, :]
    dt = jax.nn.softplus(dt_raw)
    sig = jax.nn.sigmoid(dt_raw)
    A = A_ref[0]                                       # (D_blk, N)
    Bc = B_ref[:, 0].astype(jnp.float32)               # (B_blk, N, T)
    Cc = C_ref[:, 0].astype(jnp.float32)
    gy = gy_ref[:, 0]                                  # (B_blk, D_blk, T) fp32
    h0 = st_ref[:, 0, 0]                               # (B_blk, D_blk, N)

    cdt = _compute_dtype()
    a = jnp.exp(dt[:, :, None, :] * A[None, :, :, None]).astype(cdt)
    dbu = ((dt * u).astype(cdt))[:, :, None, :] * Bc[:, None].astype(cdt)

    masked = l_valid % chunk != 0
    if masked:
        pos_t = ((nc - 1 - t) * chunk
                 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, chunk), 3))
        valid = pos_t < l_valid
        a = jnp.where(valid, a, jnp.asarray(1.0, cdt))
        dbu = jnp.where(valid, dbu, jnp.asarray(0.0, cdt))
        gy = jnp.where(valid[:, :, 0], gy, 0.0)

    # recompute within-chunk h and h_{t-1}
    h = _fwd_chunk_scan(a, dbu, n_valid=l_valid, h0=h0.astype(cdt))
    hprev = _shift_r(h, 1, jnp.asarray(0.0, cdt)) + jnp.pad(
        h0[..., None], ((0, 0), (0, 0), (0, 0), (0, h.shape[-1] - 1))
    ).astype(cdt)

    # adjoint recurrence dh_t = q_t + a_{t+1} dh_{t+1}, carry = dh_scr
    q = Cc[:, None].astype(cdt) * gy[:, :, None, :].astype(cdt)
    dh = _bwd_chunk_scan(a, q, n_valid=l_valid,
                         carry=dh_scr[...].astype(cdt))
    dh_scr[...] = (_col(a, 0) * _col(dh, 0)).astype(jnp.float32)

    dhf = dh.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    dhB = jnp.sum(dhf * Bc[:, None].astype(jnp.float32), axis=2)   # (B,D,T)
    dadt = jnp.sum((dh * hprev * a).astype(jnp.float32)
                   * A[None, :, :, None], axis=2)
    du = dt * dhB + D_ref[0, 0, :, :] * gy
    ddt = u * dhB + dadt
    ddt_raw = ddt * sig
    if masked:
        ddt_raw = jnp.where(valid[:, :, 0], ddt_raw, 0.0)
        du = jnp.where(valid[:, :, 0], du, 0.0)

    du_ref[:, 0] = du
    ddt_ref[:, 0] = ddt_raw
    dB_ref[0, :, 0] = jnp.sum(dhf * (dt * u)[:, :, None, :], axis=1)
    dC_ref[0, :, 0] = jnp.sum(hf * gy[:, :, None, :], axis=1)
    dA_ref[0] += jnp.sum((dh * hprev * a).astype(jnp.float32)
                         * dt[:, :, None, :], axis=(0, 3))
    dbias_ref[0, 0, :, :] += jnp.sum(ddt_raw, axis=(0, 2))[:, None]
    dD_ref[0, 0, :, :] += jnp.sum(gy * u, axis=(0, 2))[:, None]


def _bwd_pallas(u, delta, A, B, C, D, bias, states, gy, chunk: int,
                l_valid: int):
    bb, g, dpg, lp = u.shape
    n = A.shape[-1]
    nc = lp // chunk
    b_blk, dblk = _pick_blocks(bb, dpg, n, chunk,
                               vmem_cube_budget=1024 * 1024)
    nd = dpg // dblk

    grid = (nd, g, bb // b_blk, nc)
    kernel = functools.partial(_bwd_kernel, l_valid=l_valid, chunk=chunk)

    def rev(t):
        return nc - 1 - t

    du, ddt, dB_exp, dC_exp, dA, dbias, dD = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, rev(t))),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, rev(t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, rev(t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, rev(t))),
            pl.BlockSpec((1, dblk, n), lambda j, gg, b, t: (gg, j, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((b_blk, 1, 1, dblk, n),
                         lambda j, gg, b, t: (b, gg, rev(t), j, 0)),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, rev(t))),
        ],
        out_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, rev(t))),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, rev(t))),
            pl.BlockSpec((1, b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (j, b, gg, 0, rev(t))),
            pl.BlockSpec((1, b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (j, b, gg, 0, rev(t))),
            pl.BlockSpec((1, dblk, n), lambda j, gg, b, t: (gg, j, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bb, g, dpg, lp), jnp.float32),
            jax.ShapeDtypeStruct((bb, g, dpg, lp), jnp.float32),
            jax.ShapeDtypeStruct((nd, bb, g, n, lp), jnp.float32),
            jax.ShapeDtypeStruct((nd, bb, g, n, lp), jnp.float32),
            jax.ShapeDtypeStruct((g, dpg, n), jnp.float32),
            jax.ShapeDtypeStruct((g, nd, dblk, 1), jnp.float32),
            jax.ShapeDtypeStruct((g, nd, dblk, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, dblk, n), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, B, C, A,
      bias.reshape(g, nd, dblk, 1), D.reshape(g, nd, dblk, 1), states, gy)
    return (du, ddt, dB_exp.sum(0), dC_exp.sum(0), dA,
            dbias.reshape(g, dpg), dD.reshape(g, dpg))


# ---------------------------------------------------------------------------
# custom_vjp wrapper with the public call-site contract
# ---------------------------------------------------------------------------

DEFAULT_CHUNK = 128


def _layout(u, delta, A, B, C, D, bias, chunk):
    """(B, D, L) channel layout -> grouped (Bb, G, dpg, Lp) padded layout."""
    bb, d, l = u.shape
    g, n = B.shape[1], B.shape[2]
    dpg = d // g
    lp = _cdiv(l, chunk) * chunk
    pad = lp - l

    def pad_l(x):
        if pad == 0:
            return x
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        return jnp.pad(x, cfg)

    u4 = pad_l(u.reshape(bb, g, dpg, l))
    dt4 = pad_l(delta.reshape(bb, g, dpg, l))
    B4 = pad_l(B)
    C4 = pad_l(C)
    A3 = A.reshape(g, dpg, n).astype(jnp.float32)
    D2 = D.reshape(g, dpg).astype(jnp.float32)
    bias2 = bias.reshape(g, dpg).astype(jnp.float32)
    return u4, dt4, A3, B4, C4, D2, bias2, l, lp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _scan_core(u, delta, A, B, C, D, bias, chunk, in_dtypes):
    (y, _last), _res = _scan_core_fwd(u, delta, A, B, C, D, bias, chunk)
    return y


def _scan_core_fwd(u, delta, A, B, C, D, bias, chunk):
    bb, d, l = u.shape
    u4, dt4, A3, B4, C4, D2, bias2, l, lp = _layout(
        u, delta, A, B, C, D, bias, chunk)
    y4, states, last = _fwd_pallas(u4, dt4, A3, B4, C4, D2, bias2, chunk, l)
    y = y4.reshape(bb, d, lp)[:, :, :l]
    res = (u4, dt4, A3, B4, C4, D2, bias2, states)
    return (y, last.reshape(bb, d, -1)), res


def _vjp_fwd(u, delta, A, B, C, D, bias, chunk, in_dtypes):
    (y, _last), res = _scan_core_fwd(u, delta, A, B, C, D, bias, chunk)
    return y, res


def _vjp_bwd(chunk, in_dtypes, res, gy):
    u4, dt4, A3, B4, C4, D2, bias2, states = res
    bb, g, dpg, lp = u4.shape
    d = g * dpg
    n = A3.shape[-1]
    l = gy.shape[-1]
    if lp != l:
        gy = jnp.pad(gy, ((0, 0), (0, 0), (0, lp - l)))
    gy4 = gy.reshape(bb, g, dpg, lp).astype(jnp.float32)
    du, ddt, dB, dC, dA, dbias, dD = _bwd_pallas(
        u4, dt4, A3, B4, C4, D2, bias2, states, gy4, chunk, l)
    du = du.reshape(bb, d, lp)[:, :, :l]
    ddt = ddt.reshape(bb, d, lp)[:, :, :l]
    dB = dB[..., :l]
    dC = dC[..., :l]
    grads = (du, ddt, dA.reshape(d, n), dB, dC, dD.reshape(d),
             dbias.reshape(d))
    # cotangents must match the primal dtypes (bf16 inputs get bf16 grads)
    return tuple(gr.astype(dt) for gr, dt in zip(grads, in_dtypes))


_scan_core.defvjp(_vjp_fwd, _vjp_bwd)


def selective_scan_pallas(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    delta_bias: Optional[jax.Array] = None,
    delta_softplus: bool = True,
    return_last_state: bool = False,
    chunk: int = DEFAULT_CHUNK,
):
    """Fused selective scan with the MedMamba.py:273-279 call-site contract.

    The fused path requires delta_softplus=True (always the case in SS2D);
    D/delta_bias default to zeros when omitted.
    """
    if not delta_softplus:
        from medmamba_tpu.ops.selective_scan import selective_scan_assoc
        return selective_scan_assoc(u, delta, A, B, C, D,
                                    delta_bias=delta_bias,
                                    delta_softplus=False,
                                    return_last_state=return_last_state)
    d = u.shape[1]
    if D is None:
        D = jnp.zeros((d,), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d,), jnp.float32)
    l = u.shape[-1]
    c = min(chunk, _cdiv(l, 128) * 128)
    if return_last_state:
        (y, last), _ = _scan_core_fwd(u, delta, jnp.asarray(A, jnp.float32),
                                      B, C, D, delta_bias, c)
        return y, last
    in_dtypes = tuple(str(x.dtype) for x in
                      (u, delta, A, B, C, D, delta_bias))
    return _scan_core(u, delta, jnp.asarray(A, jnp.float32), B, C, D,
                      delta_bias, c, in_dtypes)
