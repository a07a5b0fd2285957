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


def _abl(tok: str) -> bool:
    """Pass-ledger ablation switch (VERDICT r3 #1): MEDMAMBA_SCAN_ABLATE is a
    comma-separated list of kernel pieces to stub out FOR TIMING ONLY (the
    stubs keep every shape/dtype but break numerics). tools/pass_ledger.py
    runs one fresh process per token and diffs the measured time to attribute
    cost per piece. Never set in production; oracle tests run with it unset.

    Tokens: clip fneg ehalf dub w boundary hall yc q adjb dh dhb gbc gadt."""
    env = os.environ.get("MEDMAMBA_SCAN_ABLATE")
    if not env:
        return False
    return tok in env.split(",")


def guard_ablation_unset() -> None:
    """Refuse to run with MEDMAMBA_SCAN_ABLATE set (ADVICE r4): the ablation
    stubs keep shapes but break numerics, so a stale env var leaking from a
    pass-ledger run into a real training/eval process would silently corrupt
    results. User-facing CLIs call this at startup; tools/pass_ledger.py sets
    MEDMAMBA_SCAN_ABLATE_OK=1 in its timing subprocesses to opt in."""
    if os.environ.get("MEDMAMBA_SCAN_ABLATE") and not os.environ.get(
            "MEDMAMBA_SCAN_ABLATE_OK"):
        raise RuntimeError(
            "MEDMAMBA_SCAN_ABLATE is set: the scan-kernel ablation stubs "
            "break numerics and are for pass-ledger timing only. Unset it "
            "(or set MEDMAMBA_SCAN_ABLATE_OK=1 if you really mean to).")


def _compute_dtype():
    """Scan-internal compute dtype. float32 by default (parity with the
    reference's forced-fp32 scan core, MedMamba.py:265-271); set
    MEDMAMBA_SCAN_COMPUTE=bfloat16 to trade precision for VPU throughput.

    In the SSD kernel the bf16 mode keeps exponent computation (g), the
    segment-boundary states, and all cross-N accumulations in fp32; only the
    full-cube factor tensors (E/F/ehalf/w/q/h) are bf16 (~8-bit mantissa ->
    ~1e-2 relative error vs the fp32 core; see tests)."""
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


def _use_roll_shifts() -> bool:
    """Lane shifts via pltpu.roll + masked select instead of pad+concat.
    Measured IDENTICAL on v5e (27.23 vs 27.19 ms stage-1 fwd; oracle tests
    green both ways) -- Mosaic lowers both to the same lane-rotate+select.
    Kept as a knob for future Mosaic versions."""
    return os.environ.get("MEDMAMBA_SCAN_SHIFT") == "roll"


def _shift_r(x, step, fill):
    """Shift right along the last axis by ``step`` filling with ``fill``."""
    if _use_roll_shifts() and not _interpret():
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        return jnp.where(lane < step, jnp.asarray(fill, x.dtype),
                         pltpu.roll(x, step, x.ndim - 1))
    pad = jnp.full(x.shape[:-1] + (step,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-step]], axis=-1)


def _shift_l(x, step, fill):
    if _use_roll_shifts() and not _interpret():
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        t = x.shape[-1]
        return jnp.where(lane >= t - step, jnp.asarray(fill, x.dtype),
                         pltpu.roll(x, t - step, x.ndim - 1))
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
# SSD (chunk-factored matmul) scan form -- the production kernel.
#
# Within a sub-chunk of SUBCHUNK steps the recurrence h_t = a_t h_{t-1} + b_t
# with a_t = exp(dt_t * A) is solved in closed form:
#
#   g_t = A * cumsum(dt)          (log decay from sub-chunk start, <= 0)
#   E_t = exp(g_t - m/2), F_t = 1/E_t      with m = g at sub-chunk end
#   h_t = E_t * (E_end * h_in + cumsum_t(F_s * b_s))
#
# The half-shift by m/2 centers the exponents so both E and F stay inside
# fp32 range for |A * sum(dt)| <= 2*CLIP per sub-chunk (beyond that the decay
# is < e^-120 -- numerically zero -- and a clip takes over). The cumsums are
# matmuls against constant block-triangular 0/1 matrices: they run on the MXU,
# so the VPU work per element drops from ~50 ops (Hillis-Steele doubling, the
# round-1 kernel below) to ~1 exp + a handful of multiplies. Sub-chunk and
# chunk boundaries are handled by tiny sequential recurrences on (B,D,N)
# states. This is the Mamba-2/SSD chunking idea adapted to per-(d,n) decays
# (A is a full (d_inner, d_state) matrix here, MedMamba.py:183).
# ---------------------------------------------------------------------------

SUBCHUNK = 16  # legacy default; see _tau()
# |g| bound: e^80 ~ 5.5e34 stays fp32/bf16-finite even after the x128
# within-segment cumsum; covers |A*seg_sum(dt)| <= 160. MEDMAMBA_SCAN_CLIP
# overrides it AT PROCESS START only (read once at import; a mid-process env
# change would not retrace) -- an experiment knob for the tau-exactness A/B
# positive-control arms (docs/DESIGN.md round 5): a small clip amplifies the
# factorization's beyond-budget distortion on purpose. Production unset.
_CLIP = float(os.environ.get("MEDMAMBA_SCAN_CLIP", "80.0"))


def _tau() -> int:
    """Sub-chunk (segment) length. The factored exponentials are exact only
    while |A * seg_sum(dt)| <= 2*_CLIP per segment; beyond that the clip
    distorts near-diagonal E*F decay ratios by O(1) (measured: 1.65 abs error
    at tau=32 on the adversarial shape-sweep distribution, where per-segment
    ranges reach ~180). tau=16 keeps the worst observed range comfortably
    inside the budget and is the default. tau=32 drops one doubling level
    from each of the 4 boundary scans per fwd+bwd (~10-15% kernel time) and
    is safe for trained-magnitude data (per-step dt*|A| << 1): opt in with
    MEDMAMBA_SCAN_TAU=32 when the data distribution is known."""
    return int(os.environ.get("MEDMAMBA_SCAN_TAU", "16"))


def _norm_tau_arg(tau, chunk: int):
    """Clamp a tau spec to the chunk. int -> int; an ``(m, tau_hi, tau_lo)``
    tuple (fused mixed-tau n-split, see ``_tau_parts``) keeps its part split
    unless clamping collapses the two taus, in which case it degenerates to
    the plain int path (no slicing overhead for an even split)."""
    if isinstance(tau, (tuple, list)):
        m, hi, lo = int(tau[0]), min(int(tau[1]), chunk), min(int(tau[2]), chunk)
        if hi == lo:
            return hi
        return (m, hi, lo)
    return min(int(tau or _tau()), chunk)


def _tau_parts(tau, n: int):
    """Normalize a tau spec to ``((n_start, n_stop, tau_part), ...)``.

    An int covers every state dim in one part (the pre-round-3 behavior).
    A ``(m, tau_hi, tau_lo)`` tuple is the FUSED mixed-tau n-split: state
    dims [0:m] run their within-chunk machinery at segment length tau_hi and
    dims [m:n] at tau_lo *inside the same kernel program*, sharing every
    N-independent stream (u/dt loads + softplus and the y write in the
    forward; the gy read, du/ddt writes and dbias/dD reductions in the
    backward). The two-launch realization of the same split (SS2D calling
    the kernel once per part) duplicated those streams for ~18 ms/step of
    the theoretical 26 ms the split can recover (docs/DESIGN.md round 3);
    fusing recovers them. Exactness is unchanged: y = sum_n C_n h_n and the
    clip bound is per (d, n) lane, so each lane only needs ITS tau to fit
    its measured |A|*seg_sum(dt) budget. Callers pass A/B/C with state dims
    pre-permuted so the tau_hi-safe lanes come first (train/tau_select.py
    emits the permutation; on-TPU ``m`` should be a multiple of the fp32
    sublane granule 8 -- tau_select's N_GRANULE -- so the B/C slices stay
    tile-aligned)."""
    if isinstance(tau, (tuple, list)):
        m, hi, lo = int(tau[0]), int(tau[1]), int(tau[2])
        assert 0 < m < n, f"nsplit m={m} outside (0, {n})"
        return ((0, m, hi), (m, n, lo))
    return ((0, n, int(tau)),)


def _slice_n(x, s0: int, s1: int, axis: int):
    """Static slice along the state-dim axis (identity when full-width)."""
    if s0 == 0 and s1 == x.shape[axis]:
        return x
    return jax.lax.slice_in_dim(x, s0, s1, axis=axis)


def _seg_matrices(t_len: int, tau: int):
    """Constant matmul operands for segmented scans along a T axis.

    m_cum[s, t]  = 1 if s <= t and same tau-segment   (inclusive fwd cumsum)
    m_rev[s, t]  = 1 if s >= t and same tau-segment   (inclusive rev cumsum)
    m_seg[s, t]  = 1 if same tau-segment              (segment total)
    """
    s = jax.lax.broadcasted_iota(jnp.int32, (t_len, t_len), 0)
    t = jax.lax.broadcasted_iota(jnp.int32, (t_len, t_len), 1)
    same = (s // tau) == (t // tau)
    m_cum = ((s <= t) & same).astype(jnp.float32)
    m_rev = ((s >= t) & same).astype(jnp.float32)
    m_seg = same.astype(jnp.float32)
    return m_cum, m_rev, m_seg


def _seg_scan_fwd(p, z, tau: int, t_len: int):
    """Inclusive scan of x_j = p_j x_{j-1} + z_j over tau-sized segments.

    p/z hold segment-constant values replicated along the T axis; shifts move
    whole segments (lane shifts in tau strides -- full-lane ops, no extracts).
    """
    x, acc, step = z, p, tau
    while step < t_len:
        x = x + acc * _shift_r(x, step, 0.0)
        step *= 2
        if step < t_len:
            acc = acc * _shift_r(acc, step // 2, 1.0)
    return x


def _seg_scan_rev(p, z, tau: int, t_len: int):
    """Reverse inclusive scan x_j = z_j + p_j x_{j+1} over tau segments."""
    x, acc, step = z, p, tau
    while step < t_len:
        x = x + acc * _shift_l(x, step, 0.0)
        step *= 2
        if step < t_len:
            acc = acc * _shift_l(acc, step // 2, 1.0)
    return x


def _nseg2_impl(pitch: Optional[int] = None, tau: int = 0) -> str:
    """Lowering for the 2-segment boundary recurrence (tau = chunk/2 -- the
    production lo-part regime of the fused mixed-tau n-split, where stages
    0-2's high-|A| lanes run at tau=64 under a 128 chunk).

    The generic path solves Hend_j = p_j Hend_prev + z_j with a fold + a
    tau-stride doubling scan + a concat over full (Bb, Db, N, T) cubes.
    At nseg == 2 the recurrence is one step, so two direct lowerings exist:

      * col: per-segment column extracts solve the step on (Bb, Db, N)
        smalls; the entering-state broadcast is ONE broadcast + ONE select.
      * shift: keep the fold, replace scan+concat with one shift + select.

    MEASURED (v5e-1, stage-0 grad, 2026-08-20, docs/experiments/
    ledger_r04_raw.jsonl): col 50.8 / shift 45.3 / scan 44.9 ms at the
    production nsplit spec (col 58.6 / 47.9 / 47.7 at uniform tau=64) --
    the lane extracts cost more than the ~4 cube passes they delete, the
    same relayout tax that sank the round-3 compact mode, and the shift
    variant is measurement-neutral. BUT on the PACKED pitch == tau case
    (stage 3: every segment an element boundary, no cross-segment state at
    all) col wins 32% (5.09 vs 7.53 ms): its packed branch emits just one
    select against zero. Default policy ("auto"): col when pitch == tau,
    the generic scan otherwise. MEDMAMBA_SCAN_NSEG2=col|shift|scan forces.
    """
    mode = os.environ.get("MEDMAMBA_SCAN_NSEG2", "auto")
    if mode != "auto":
        if mode not in ("col", "shift", "scan"):
            raise ValueError(
                f"MEDMAMBA_SCAN_NSEG2={mode!r}: expected one of "
                "col|shift|scan|auto (a typo here would silently measure "
                "the wrong variant in a ledger A/B)")
        return mode
    return "col" if (pitch is not None and pitch == tau) else "scan"


def _boundary_solve(ehalf, zsum, carry, tau: int, chunk: int, fwd_dir: bool,
                    pitch: Optional[int]):
    """Solve the segment-boundary recurrence over ``chunk // tau`` segments,

        Hend_j = p_j * Hend_prev + z_j,   p_j = ehalf_j^2, z_j = ehalf_j*zsum_j,

    processed left-to-right when ``fwd_dir`` (the primal forward scan / the
    adjoint of a reversed scan) and right-to-left otherwise.

    ``ehalf`` / ``zsum`` are segment-constant (Bb, Db, N, T) cubes (values
    replicated along each tau-segment's lanes); ``carry`` (Bb, Db, N) is the
    entering state. ``pitch`` is the packed-element pitch (reset masks
    decouple packed elements exactly as ``_pack_reset_mask`` describes).
    Returns ``(ent, last)``:

      ent:  (Bb, Db, N, T) -- the state ENTERING each segment broadcast
            along T (= carry for the first-processed segment);
      last: (Bb, Db, N) -- the final carry (Hend of the last-processed
            segment).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, chunk), 3)
    first = (lane < tau) if fwd_dir else (lane >= chunk - tau)
    nseg = chunk // tau
    carry_b = jnp.broadcast_to(carry[..., None], carry.shape + (chunk,))
    impl2 = _nseg2_impl(pitch, tau) if nseg == 2 else ""
    if nseg == 2 and impl2 == "col":
        # one-step recurrence on per-segment column extracts: no p/z cubes,
        # no fold, no scan -- ~2 cube passes (broadcast + select) + smalls
        if fwd_dir:
            c0, c1 = tau - 1, chunk - 1      # first-, last-processed segment
        else:
            c0, c1 = chunk - 1, 0
        e0, e1 = _col(ehalf, c0), _col(ehalf, c1)
        z0, z1 = e0 * _col(zsum, c0), e1 * _col(zsum, c1)
        hend0 = z0 + (e0 * e0) * carry
        if pitch is not None:
            # nseg==2 packing implies pitch == tau: every segment starts an
            # element, so the second-processed segment enters with zero state
            # (p reset-zeroed in the generic path)
            ent = jnp.where(first, carry_b, 0.0)
            last = z1
        else:
            ent = jnp.where(first, carry_b,
                            jnp.broadcast_to(hend0[..., None],
                                             hend0.shape + (chunk,)))
            last = z1 + (e1 * e1) * hend0
        return ent, last
    p = ehalf * ehalf
    z = ehalf * zsum
    reset = (None if pitch is None else
             _pack_reset_mask(fwd_dir, pitch, tau, chunk))
    if reset is not None:
        p = jnp.where(reset, 0.0, p)         # decouple packed elements
    z = jnp.where(first, z + p * carry_b, z)
    if nseg == 2 and impl2 == "shift":       # shift variant: fold kept
        if fwd_dir:
            s = _shift_r(z, tau, 0.0)
            last = _col(z, -1) + _col(p, -1) * _col(s, -1)
        else:
            s = _shift_l(z, tau, 0.0)
            last = _col(z, 0) + _col(p, 0) * _col(s, 0)
        ent = jnp.where(first, carry_b, s)
        if reset is not None:
            ent = jnp.where(reset, 0.0, ent)
        return ent, last
    if fwd_dir:
        hend = _seg_scan_fwd(p, z, tau, chunk)
        ent = jnp.concatenate([carry_b[..., :tau], hend[..., :-tau]],
                              axis=-1)
        last = _col(hend, -1)
    else:
        hend = _seg_scan_rev(p, z, tau, chunk)
        ent = jnp.concatenate([hend[..., tau:], carry_b[..., :tau]],
                              axis=-1)
        last = _col(hend, 0)
    if reset is not None:
        ent = jnp.where(reset, 0.0, ent)
    return ent, last


def _matmul_t(x, m, hi_fidelity: bool = False, adjoint: bool = False):
    """Contract the last (T) axis of x with rows of the (T, K) matrix m.

    Collapsed to a plain (M, K) @ (K, N) so Mosaic maps it straight onto the
    MXU (K = chunk = 128: full-width systolic tiles). The TPU DEFAULT
    precision rounds fp32 operands to one bf16 pass, which costs ~3 decimal
    digits on the cumsummed scan values -- outside the kernel's parity
    tolerance. Two exact remedies:

      * split2 (default for the big cube contractions): decompose
        x = hi + lo into two bf16 operands (~17 mantissa bits) and run two
        DEFAULT-precision passes against the 0/1 matrix (exact in bf16).
        2 MXU passes instead of HIGHEST's 6.
      * HIGHEST (``hi_fidelity=True``, used for the dt cumsum whose absolute
        error budget is tighter -- g = A*cumsum(dt) sits inside an exp).

    ``adjoint=True`` marks the backward kernel's cube contractions (the
    within-chunk h recompute and the adjoint eq-cumsum): those feed only
    GRADIENTS, whose error budget is set by the bf16 cotangent rounding the
    block-dtype model applies anyway (~4e-3 relative), not by the forward's
    1e-3 logit-parity tolerance. MEDMAMBA_SSD_PREC_BWD selects their mode
    separately (same values); unset, they inherit MEDMAMBA_SSD_PREC.

    MEASURED (v5e-1, 2026-08-19, tau=128 grad): PREC_BWD=default (one MXU
    pass instead of split2's two, grad error 2.5e-3 vs reference) is
    SLIGHTLY SLOWER -- stage-1 37.5 -> 39.0 ms, stage-2 20.7 -> 22.0,
    stages 3/4 neutral. The MXU matmuls are fully latency-hidden behind the
    kernel's VPU passes, so halving MXU work buys nothing and DEFAULT's
    internal fp32->bf16 rounding costs an extra VPU op that split2's hi/lo
    casts apparently overlap better. Default stays inherit(split2); the
    knob remains for re-measurement on future hardware where the MXU:VPU
    balance differs.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    dn = (((1,), (0,)), ((), ()))
    mode = "highest" if hi_fidelity else os.environ.get(
        "MEDMAMBA_SSD_PREC", "split2")
    if adjoint and not hi_fidelity:
        mode = os.environ.get("MEDMAMBA_SSD_PREC_BWD", mode)
    if x2.dtype == jnp.bfloat16:
        # bf16 cube mode: operands already carry only 8 mantissa bits --
        # one DEFAULT pass with fp32 accumulation is exact for them
        return jax.lax.dot_general(
            x2, m.astype(jnp.bfloat16), dn,
            preferred_element_type=jnp.float32,
        ).reshape(shape[:-1] + (m.shape[1],))
    if mode == "split2":
        mb = m.astype(jnp.bfloat16)
        hi = x2.astype(jnp.bfloat16)
        lo = (x2 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (jax.lax.dot_general(hi, mb, dn,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(lo, mb, dn,
                                     preferred_element_type=jnp.float32))
    else:
        prec = {"default": jax.lax.Precision.DEFAULT,
                "highest": jax.lax.Precision.HIGHEST}[mode]
        out = jax.lax.dot_general(x2, m, dn,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
    return out.reshape(shape[:-1] + (m.shape[1],))


def _pack_reset_mask(scan_is_fwd: bool, pitch: int, tau: int, chunk: int):
    """Zero-mask (1,1,1,chunk) for batch-packed chunks (pitch < chunk): kills
    the boundary-scan coupling between packed elements.

    Packing places ``chunk // pitch`` independent batch elements side by side
    along the lane axis (each padded to ``pitch`` lanes, a multiple of tau).
    A forward-running segment scan leaks state from element k to k+1 through
    the first segment of each element (its ``p`` multiplies the previous
    element's last segment state): zero p there. A reverse-running scan leaks
    through the last segment of each element. The same masks zero the
    state-entering-segment broadcast (hin / v) at those segments."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, chunk), 3)
    inelem = lane % pitch
    if scan_is_fwd:
        # first segment of every element but the first
        return (inelem < tau) & (lane >= pitch)
    # last segment of every element but the last
    return (inelem >= pitch - tau) & (lane < chunk - tau)


def _boundary_impl() -> str:
    """auto (default): the compact per-segment form when the chunk is a
    single tau-segment (where it degenerates to a free lane-broadcast --
    the tau=chunk fast path), the round-2 cube form otherwise.

    Forcing compact for nseg>1 was built and MEASURED SLOWER on v5e
    (stage-1 fwd 63.1 vs 26.9 ms, fwd+bwd 183.7 vs 76.7): the per-segment
    (Bb, Db, N) pieces cost ~33 tiny relayout/extract/stack ops per grid
    step whose fixed overheads dwarf the ~15 cube passes they replace.
    (The fused (Bb, Db, N*nseg)-lane layout that would fix this does not
    compile: Mosaic rejects sublane<->lane reshape casts and strided lane
    gathers -- see tools/probe_mosaic.py.) Values: auto | compact | cube."""
    return os.environ.get("MEDMAMBA_SCAN_BOUNDARY", "auto")


def _use_compact(chunk: int, tau: int, pitch: Optional[int] = None) -> bool:
    mode = _boundary_impl()
    if mode == "auto":
        # nseg==1: the boundary machinery degenerates to a free
        # lane-broadcast. pitch==tau (packed, one segment per element, all
        # cross-segment state trace-time zero) looked like it should also
        # favor compact, but MEASURED NEUTRAL on v5e (stage-4 tau=64 grad
        # in-chain A/B: cube 8.17/7.57 vs compact 7.40/7.96 ms, overlapping)
        # -- the packed kernel is bound by passes both lowerings share, so
        # auto keeps the single well-trodden cube path for nseg>1.
        return chunk // tau == 1
    return mode == "compact"


def _pick_matrix(t_len: int, tau: int):
    """(T, nseg) 0/1 matrix: m[s, j] = 1 iff s lies in tau-segment j.
    Right-multiplying compacts per-segment sums; its transpose broadcasts
    per-segment values back along T."""
    nseg = t_len // tau
    s = jax.lax.broadcasted_iota(jnp.int32, (t_len, nseg), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t_len, nseg), 1)
    return ((s // tau) == j).astype(jnp.float32)


def _seg_broadcast(vals, tau: int, chunk: int):
    """Broadcast per-segment (Bb, Db, N) values to (Bb, Db, N, chunk) with
    vals[j] filling tau-segment j.

    Two lowerings:
      * select (default for nseg <= 4): a chain of nseg-1 lane-mask selects
        on full-lane broadcast operands -- no (..., nseg)-minor stack, which
        Mosaic lowers to the strided-sublane relayouts that made the forced
        compact mode 2.3x slower at nseg=8 (docs/DESIGN.md round-3 table);
      * matmul: jnp.stack to (..., nseg) then a pick-matrix MXU matmul --
        fewer passes once nseg is large enough that a select chain costs
        more cube passes than the relayout.
    Override with MEDMAMBA_SCAN_SEGBCAST=select|matmul for measurement.
    """
    nseg = len(vals)
    if nseg == 1:
        return vals[0][..., None]
    mode = os.environ.get("MEDMAMBA_SCAN_SEGBCAST",
                          "select" if nseg <= 4 else "matmul")
    if mode == "select":
        seg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, chunk), 3) // tau
        out = jnp.broadcast_to(vals[0][..., None],
                               vals[0].shape + (chunk,))
        for j in range(1, nseg):
            bj = jnp.broadcast_to(vals[j][..., None],
                                  vals[j].shape + (chunk,))
            out = jnp.where(seg == j, bj, out)
        return out
    stacked = jnp.stack(vals, axis=-1)
    return _matmul_t(stacked, _pick_matrix(chunk, tau).T)


def _ssd_core_compact(dt, u, A, Bc, chunk: int, tau: int, h0,
                      reverse: bool = False, pitch: Optional[int] = None,
                      adjoint: bool = False):
    """Compact-boundary SSD forward machinery (round 3).

    Same closed form as _ssd_forward_core, but the segment-boundary
    recurrence runs as a static nseg-step loop over per-segment (Bb, Db, N)
    tensors (1/tau of cube scale) instead of tau-replicated doubling scans
    over (Bb, Db, N, T) cubes: the round-2 kernel spent ~15 of its ~33
    full-cube VPU passes on that boundary machinery. The only cube-scale
    boundary op left is one (nseg, T)-selector matmul broadcasting the
    per-segment entry states back along T -- MXU work, not VPU passes.
    Mosaic constraints shaped this design (see tools/probe_mosaic.py):
    sublane<->lane reshapes and strided lane gathers do not compile, but
    static minor-dim indexing, axis stacking, and minor-R matmul operands
    do.

    Per-segment values are Python lists indexed by segment -- everything
    (processing order, packed-element resets) is resolved at trace time,
    so the packed path needs no runtime masks here at all.

    Returns (E, F, ehs, ps, GvT, h_last, dub):
      E/F: centered decay cubes (Bb, Db, N, T), compute dtype;
      ehs/ps: per-segment half/full decays, nseg-lists of (Bb, Db, N);
      GvT: G + broadcast(eh * hin), i.e. h_all = E * GvT;
      h_last: chunk-exit state (Bb, Db, N) fp32;
      dub: the dt*u (x) B cube (computed here for w anyway -- the backward
      reuses it instead of spending a cube pass rebuilding it).
    """
    cdt = _compute_dtype()
    nseg = chunk // tau
    m_cum, m_rev, m_seg = _seg_matrices(chunk, tau)
    m_dir = m_rev if reverse else m_cum
    m_pick = _pick_matrix(chunk, tau)
    # dt cumsum + per-segment totals in one HIGHEST matmul (feeds exp)
    s2send = _matmul_t(dt, jnp.concatenate(
        [m_dir - 0.5 * m_seg, m_pick], axis=1), hi_fidelity=True)
    S2 = s2send[..., :chunk]
    g = A[None, :, :, None] * S2[:, :, None, :]
    if not _abl("clip"):
        g = jnp.clip(g, -_CLIP, _CLIP)
    E = jnp.exp(g).astype(cdt)                              # (Bb, Db, N, T)
    F = E if _abl("fneg") else jnp.exp(-g).astype(cdt)
    du = dt * u
    if _abl("dub"):
        dub = jnp.broadcast_to(du.astype(cdt)[:, :, None, :],
                               E.shape).astype(cdt)
    else:
        dub = du.astype(cdt)[:, :, None, :] * Bc.astype(cdt)[:, None]
    w = dub if _abl("w") else F * dub                       # b_t = F*dt*u*B
    # within-segment scan (MXU) + per-segment totals
    gg = _matmul_t(w, jnp.concatenate([m_dir, m_pick], axis=1),
                   adjoint=adjoint)
    G = gg[..., :chunk]
    # per-segment pieces: eh_j = E at segment j's end = exp(A * send_j / 2)
    # (exponent <= 0: underflows to 0 gracefully, no clip needed)
    ehs, ps, zs = [], [], []
    for j in range(nseg):
        sj = _col(s2send, chunk + j)                        # (Bb, Db)
        eh = jnp.exp(0.5 * sj[:, :, None] * A[None])        # (Bb, Db, N)
        ehs.append(eh)
        ps.append(eh * eh)                                  # e^{m_j}
        zs.append(eh * _col(gg, chunk + j))                 # E_end_j * gsum_j
    # segment-boundary recurrence Hend_j = p_j Hend_prev + z_j as a static
    # sequential loop (processing order and packed-element boundaries are
    # compile-time constants)
    spe = None if pitch is None else pitch // tau
    order = range(nseg - 1, -1, -1) if reverse else range(nseg)
    hins = [None] * nseg
    h = h0
    for idx, j in enumerate(order):
        if spe is not None and idx % spe == 0 and idx > 0:
            h = jnp.zeros_like(h0)      # packed element enters with zero state
        hins[j] = h
        h = ps[j] * h + zs[j]
    h_last = h
    # state contribution broadcast back along T: with one segment per chunk
    # (the tau=chunk fast path) it is a free lane-broadcast; otherwise a
    # select chain / pick-matrix matmul (_seg_broadcast). h_all = E*(G + vT).
    vT = _seg_broadcast([ehs[j] * hins[j] for j in range(nseg)], tau, chunk)
    return E, F, ehs, ps, G + vT, h_last, dub


def _ssd_forward_core(dt, u, A, Bc, chunk: int, tau: int,
                      h0=None, hin_bcast=None, reverse: bool = False,
                      pitch: Optional[int] = None, adjoint: bool = False):
    """Shared fwd computation.

    dt: (Bb, Db, T) post-softplus (masked 0 in padded tail), u: (Bb, Db, T),
    A: (Db, N), Bc: (Bb, N, T). Exactly one of:
      * h0 (Bb, Db, N): chunk entry state -- run the segment-boundary scan
        (forward kernel);
      * hin_bcast (Bb, Db, N, T): saved per-segment entry states broadcast
        along T -- skip the scan entirely (backward kernel, which loads the
        states the forward saved as residuals).
    ``reverse=True`` scans the buffer right-to-left (the mirror image of the
    normal direction: suffix cumsums, left-shifting segment scan, entry state
    arriving from the right) -- used for MedMamba's flipped scan directions
    so the surrounding model never materializes flipped sequences.
    Returns (E, F, ehalf, G, hin_bcast, h_all, h_last, dub); h_last is None
    in hin_bcast mode.
    """
    cdt = _compute_dtype()
    m_cum, m_rev, m_seg = _seg_matrices(chunk, tau)
    m_dir = m_rev if reverse else m_cum
    # one (T, 2T) matmul: [segmented cumsum - half segment total | seg total];
    # HIGHEST: this feeds exp(A * .), whose absolute error budget is tight
    s2send = _matmul_t(dt, jnp.concatenate(
        [m_dir - 0.5 * m_seg, m_seg], axis=1), hi_fidelity=True)
    S2, send = s2send[..., :chunk], s2send[..., chunk:]
    g = A[None, :, :, None] * S2[:, :, None, :]
    if not _abl("clip"):
        g = jnp.clip(g, -_CLIP, _CLIP)
    E = jnp.exp(g).astype(cdt)                   # (Bb, Db, N, T)
    # exp runs on the VPU's transcendental path at ~zero marginal cost
    # (measured by ablation); a true divide does not
    F = E if _abl("fneg") else jnp.exp(-g).astype(cdt)
    # exp(m_j/2) = decay over half a segment; exponent <= 0, no clip needed
    if _abl("ehalf"):
        ehalf = jnp.ones(E.shape, jnp.float32)
    else:
        ehalf = jnp.exp((0.5 * send)[:, :, None, :] * A[None, :, :, None])

    du = dt * u
    if _abl("dub"):
        dub = jnp.broadcast_to(du.astype(cdt)[:, :, None, :],
                               E.shape).astype(cdt)
    else:
        dub = du.astype(cdt)[:, :, None, :] * Bc.astype(cdt)[:, None]
    w = dub if _abl("w") else F * dub            # b_t = dt*u*B (cdt)

    h_last = None
    if hin_bcast is not None:
        G = _matmul_t(w, m_dir, adjoint=adjoint)  # within-segment scan (MXU)
    else:
        # one merged matmul: within-segment scan + segment totals
        ggsum = _matmul_t(w, jnp.concatenate([m_dir, m_seg], axis=1),
                          adjoint=adjoint)
        G, gsum = ggsum[..., :chunk], ggsum[..., chunk:]
        if _abl("boundary"):
            hin_bcast, h_last = jnp.broadcast_to(
                h0[..., None], h0.shape + (chunk,)), h0
        else:
            # segment-boundary recurrence Hend_j = P_j Hend_{prev} + Z_j
            # (P = ehalf^2 whole-segment decay, Z = ehalf * segment total)
            hin_bcast, h_last = _boundary_solve(
                ehalf, gsum, h0, tau, chunk, not reverse, pitch)
    if _abl("hall"):
        h_all = E * G
    else:
        h_all = E * (G + ehalf * hin_bcast)
    return E, F, ehalf, G, hin_bcast, h_all, h_last, dub


def _part_fwd(dt, u, A, Bc, Cc, h0, chunk: int, tau: int, rev: bool,
              pitch: Optional[int]):
    """One state-dim part's forward: within-chunk machinery at segment
    length ``tau`` on (possibly N-sliced) A/Bc/Cc/h0. Returns the part's
    output contribution y_p = sum_n C_n h_n (fp32, no D*u) and its chunk-exit
    state."""
    if _use_compact(chunk, tau, pitch):
        E, _F, _ehs, _ps, GvT, h_last, _dub = _ssd_core_compact(
            dt, u, A, Bc, chunk, tau, h0=h0, reverse=rev, pitch=pitch)
        if _abl("yc"):
            return jnp.sum(E * GvT, axis=2), h_last
        return jnp.sum(E * GvT * Cc[:, None], axis=2), h_last
    _E, _F, _eh, _G, _hb, h_all, h_last, _dub = _ssd_forward_core(
        dt, u, A, Bc, chunk, tau, h0=h0, reverse=rev, pitch=pitch)
    if _abl("yc"):
        return jnp.sum(h_all, axis=2), h_last
    return jnp.sum(h_all * Cc[:, None], axis=2), h_last


def _fwd_kernel_ssd(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                    y_ref, st_ref, last_ref, h_scr,
                    *, l_valid: int, chunk: int, tau,
                    reverse=False, pitch: Optional[int] = None,
                    elem_len: Optional[int] = None):
    """``reverse``: bool (uniform direction) or ``("mixed", n_fwd)`` --
    groups < n_fwd scan forward, groups >= n_fwd scan in reverse, resolved
    per program with a branch on the group grid index (the launch-merge that
    lets SS2D run all four CrossScan directions in ONE kernel call).
    ``tau``: int or the fused mixed-tau ``(m, tau_hi, tau_lo)`` n-split
    (see ``_tau_parts``)."""
    t = pl.program_id(3)
    nc = pl.num_programs(3)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros(h_scr.shape, h_scr.dtype)

    u = u_ref[:, 0].astype(jnp.float32)               # (Bb, Db, T)
    dt0 = dt_ref[:, 0].astype(jnp.float32)
    dt0 = jax.nn.softplus(dt0 + bias_ref[0, 0, :, :])
    if pitch is not None and elem_len is not None and elem_len < pitch:
        # packed tails: zero dt past each element's true length so pad lanes
        # carry decay 1 / inject 0 exactly like the unpacked path (ADVICE r2:
        # unmasked pad dt consumed CLIP headroom in the near-clip regime)
        inelem = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, chunk), 2) % pitch
        dt0 = jnp.where(inelem < elem_len, dt0, 0.0)
    A = A_ref[0]                                      # (Db, N)
    Bc = B_ref[:, 0].astype(jnp.float32)              # (Bb, N, T)
    Cc = C_ref[:, 0].astype(jnp.float32)

    def _go(rev: bool):
        dt = dt0
        if pitch is None and l_valid % chunk != 0:
            # buffer chunk index: reversed scans walk chunks last-to-first
            c = (nc - 1 - t) if rev else t
            pos = c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, chunk), 2)
            dt = jnp.where(pos < l_valid, dt, 0.0)    # pad: decay 1, inject 0
        h0 = h_scr[...]                               # (Bb, Db, N)
        parts = _tau_parts(tau, A.shape[-1])
        y, lasts = None, []
        for s0, s1, tau_p in parts:
            # per-part N slices: B/C slice the sublane axis (granule-aligned
            # at m % 8 == 0); A/h0 slice their minor (lane) axis -- tiny
            # (Bb, Db, N)-scale relayouts, nothing cube-scale
            y_p, h_last_p = _part_fwd(
                dt, u, _slice_n(A, s0, s1, 1), _slice_n(Bc, s0, s1, 1),
                _slice_n(Cc, s0, s1, 1), _slice_n(h0, s0, s1, 2),
                chunk, tau_p, rev, pitch)
            y = y_p if y is None else y + y_p         # (Bb, Db, T) fp32
            lasts.append(h_last_p)
        h_last = lasts[0] if len(lasts) == 1 else jnp.concatenate(lasts, -1)
        # store in the output buffer's dtype (bf16 block mode emits bf16
        # directly: the model cast this immediately anyway, so values are
        # bit-identical and the write traffic halves)
        y_ref[:, 0] = (y + D_ref[0, 0, :, :] * u).astype(y_ref.dtype)
        # residual for the backward: the chunk entry state (the backward
        # recomputes within-chunk quantities from it; storing finer-grained
        # segment states was measured slower -- the (.., R=8)-lane layouts
        # cost more than the recompute saves)
        st_ref[:, 0, 0] = h0
        h_scr[...] = h_last

    if isinstance(reverse, tuple):                    # ("mixed", n_fwd)
        n_fwd = reverse[1]
        g_id = pl.program_id(1)

        @pl.when(g_id < n_fwd)
        def _():
            _go(False)

        @pl.when(g_id >= n_fwd)
        def _():
            _go(True)
    else:
        _go(bool(reverse))

    @pl.when(t == nc - 1)
    def _():
        last_ref[:, 0] = h_scr[...]


# ---------------------------------------------------------------------------
# Round-1 (Hillis-Steele doubling) forward kernel, kept as a selectable
# fallback: MEDMAMBA_SCAN_KERNEL=hillis. Exact for arbitrarily extreme
# delta/A magnitudes (no factored exponentials), ~2.5x slower.
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


def _kernel_impl() -> str:
    """ssd (default, chunk-factored matmul form) | hillis (round-1 doubling)."""
    return os.environ.get("MEDMAMBA_SCAN_KERNEL", "ssd")


def _norm_reverse(reverse, g: int):
    """Normalize a reverse spec to False | True | ("mixed", n_fwd).

    A per-group tuple must be all-False, all-True, or a False-prefix /
    True-suffix split (the SS2D direction layout); arbitrary interleavings
    are rejected (callers fall back to direction-homogeneous dispatch)."""
    if isinstance(reverse, (tuple, list)):
        fl = tuple(bool(x) for x in reverse)
        if len(fl) != g:
            raise ValueError(f"{len(fl)} reverse flags for {g} groups")
        if not any(fl):
            return False
        if all(fl):
            return True
        n_fwd = fl.index(True)
        if fl != (False,) * n_fwd + (True,) * (g - n_fwd):
            raise ValueError(f"unsupported mixed reverse pattern {fl}")
        return ("mixed", n_fwd)
    return bool(reverse)


def _fwd_pallas(u, delta, A, B, C, D, bias, chunk: int, l_valid: int,
                reverse=False, pitch: Optional[int] = None,
                elem_len: Optional[int] = None,
                tau: Optional[int] = None, out_dtype=None):
    """delta: (Bb, G, dpg, Lp); B/C: (Bb, G, N, Lp); A: (G, dpg, N);
    D/bias: (G, dpg); u: (Bb, G_u, dpg, Lp) where G_u divides G -- group k
    reads u group ``k % G_u`` via its index map, so SS2D's shared forward/
    reverse input buffers are never duplicated in HBM. Returns y (fp32),
    chunk states, last state.

    ``reverse``: False | True | per-group tuple (False-prefix/True-suffix).
    Reversed groups scan right-to-left over the buffer: data blocks are fed
    in reversed chunk order and the kernel mirrors its scan direction, so
    flipped sequences are never materialized and y comes out in buffer
    order."""
    bb, g_u, dpg, lp = u.shape
    g = B.shape[1]
    n = A.shape[-1]
    nc = lp // chunk
    rev = _norm_reverse(reverse, g)
    b_blk, dblk = _pick_blocks(bb, dpg, n, chunk)
    if _kernel_impl() == "ssd":
        # the SSD form keeps ~11 (Bb, Db, N, T) cubes live (E/F/W/G/q/h/...)
        # vs ~4 for the doubling kernel: smaller blocks, same total work
        b_blk, dblk = _pick_blocks(bb, dpg, n, chunk,
                                   vmem_cube_budget=int(os.environ.get(
                                       "MEDMAMBA_SCAN_CUBE_BUDGET",
                                       1024 * 1024)))
        kernel = functools.partial(_fwd_kernel_ssd, l_valid=l_valid,
                                   chunk=chunk,
                                   tau=_norm_tau_arg(tau, chunk),
                                   reverse=rev, pitch=pitch,
                                   elem_len=elem_len)
    else:
        assert rev is False and pitch is None and g_u == g, \
            "reverse/packed/shared-u scans require the ssd kernel"
        out_dtype = None  # the hillis fallback stores fp32
        kernel = functools.partial(_fwd_kernel, l_valid=l_valid, chunk=chunk)
    nd = dpg // dblk
    grid = (nd, g, bb // b_blk, nc)

    def data_t(gg, t):  # buffer chunk index for processed chunk t
        if rev is True:
            return nc - 1 - t
        if rev is False:
            return t
        return jnp.where(gg >= rev[1], nc - 1 - t, t)

    st_spec = pl.BlockSpec((b_blk, 1, 1, dblk, n),
                           lambda j, gg, b, t: (b, gg, t, j, 0))
    st_shape = jax.ShapeDtypeStruct((bb, g, nc, dpg, n), jnp.float32)

    y, states, last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg % g_u, j, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, data_t(gg, t))),
            pl.BlockSpec((1, dblk, n), lambda j, gg, b, t: (gg, j, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            st_spec,
            pl.BlockSpec((b_blk, 1, dblk, n),
                         lambda j, gg, b, t: (b, gg, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bb, g, dpg, lp), out_dtype or jnp.float32),
            st_shape,
            jax.ShapeDtypeStruct((bb, g, dpg, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b_blk, dblk, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # only the L-chunk axis is sequential (VMEM-carried state);
            # d-block / group / batch-block programs are independent
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(u, delta, B, C, A,
      bias.reshape(g, nd, dblk, 1), D.reshape(g, nd, dblk, 1))
    return y, states, last


# ---------------------------------------------------------------------------
# SSD backward kernel: recomputes h within the chunk from the saved entry
# state (same closed form as the forward), then solves the adjoint recurrence
#   dh_t = C_t gy_t + a_{t+1} dh_{t+1}
# with the same factored machinery run right-to-left:
#   dh_t = F_t * (revcumsum_t(E_s q_s) + E_end_j * Phi_j),  q = C * gy,
# where Phi_j carries contributions from later segments/chunks. Parameter
# gradients use a_t h_{t-1} = h_t - dt*u*B_t, so no extra exponentials.
# ---------------------------------------------------------------------------

def _part_bwd(dt, u, gy, A, Bc, Cc, h0, carry_in, chunk: int, tau: int,
              rv_dir: bool, pitch: Optional[int]):
    """One state-dim part's backward: recompute + adjoint scan + gradient
    contractions at segment length ``tau`` on (possibly N-sliced) operands.
    Returns (dhB, dadt, dbc, dcc, dA_p, carry_out): the (Bb, Db, T) pieces
    the caller combines into du/ddt across parts, the part's dB/dC/dA
    contributions, and the adjoint chunk carry for this part's lanes."""
    cdt = _compute_dtype()
    m_cum, m_rev, m_seg = _seg_matrices(chunk, tau)
    m_adj = m_cum if rv_dir else m_rev
    if _use_compact(chunk, tau, pitch):
        # recompute (compact boundary) + compact adjoint scan:
        # dh_t = F_t * (adjcumsum_t(E q) + E_end_j * V_j), with the
        # cross-segment carries V as per-segment (Bb, Db, N) tensors
        nseg = chunk // tau
        m_pick = _pick_matrix(chunk, tau)
        E, F, ehs, ps, GvT, _hl, dub = _ssd_core_compact(
            dt, u, A, Bc, chunk, tau, h0=h0, reverse=rv_dir, pitch=pitch,
            adjoint=True)
        h_all = E * GvT
        eq = E * (Cc.astype(cdt)[:, None] * gy.astype(cdt)[:, :, None, :])
        rcg = _matmul_t(eq, jnp.concatenate([m_adj, m_pick], axis=1),
                        adjoint=True)
        rc = rcg[..., :chunk]
        # adjoint boundary recurrence V_prev = p_j V + E_end_j sum_j(Eq),
        # processed opposite to the primal direction, as a static loop on
        # per-segment (Bb, Db, N) tensors (mirror of the forward's)
        spe = None if pitch is None else pitch // tau
        order = range(nseg) if rv_dir else range(nseg - 1, -1, -1)
        vs = [None] * nseg
        V = carry_in
        for idx, k in enumerate(order):
            if spe is not None and idx % spe == 0 and idx > 0:
                V = jnp.zeros_like(V)   # packed element boundary
            vs[k] = V
            V = ps[k] * V + ehs[k] * _col(rcg, chunk + k)
        carry_out = V                   # carry into the next-processed chunk
        vaT = _seg_broadcast([ehs[k] * vs[k] for k in range(nseg)],
                             tau, chunk)
        dh = F * (rc + vaT)
    else:
        E, F, ehalf, _G, _hb, h_all, _h_last, dub = _ssd_forward_core(
            dt, u, A, Bc, chunk, tau, h0=h0, reverse=rv_dir, pitch=pitch,
            adjoint=True)

        # adjoint scan: dh_t = F_t * (revcumsum_t(E q) + E_end_j V_j)
        # with the cross-segment carries V solved opposite to the forward
        # direction (everything below is the exact lane mirror when rv_dir)
        if _abl("q"):
            eq = E
        else:
            q = Cc.astype(cdt)[:, None] * gy.astype(cdt)[:, :, None, :]
            eq = E * q                             # (Bb, Db, N, T) cdt
        rcg = _matmul_t(eq, jnp.concatenate([m_adj, m_seg], axis=1),
                        adjoint=True)
        rc, rcsum = rcg[..., :chunk], rcg[..., chunk:]  # cumsum|totals
        if _abl("adjb"):
            v, carry_out = jnp.broadcast_to(
                carry_in[..., None], carry_in.shape + (chunk,)), carry_in
        else:
            # carries V_j = p_j V_prev + ehalf_j * sum_j(Eq), processed
            # opposite to the primal direction; packed-element resets inside
            v, carry_out = _boundary_solve(
                ehalf, rcsum, carry_in, tau, chunk, rv_dir, pitch)
        dh = rc if _abl("dh") else F * (rc + ehalf * v)

    # parameter/input gradient pieces (a_t h_{t-1} = h_t - dub_t)
    if _abl("dhb"):
        dhB = jnp.sum(dh, axis=2)
    else:
        dhB = jnp.sum(dh * Bc[:, None], axis=2)    # (Bb, Db, T)
    if _abl("gadt"):
        dadt = jnp.zeros(dh.shape[:2] + dh.shape[3:], jnp.float32)
        dA_p = jnp.zeros((dh.shape[1], dh.shape[2]), jnp.float32)
    else:
        p2 = dh * (h_all - dub)
        dadt = jnp.sum(p2 * A[None, :, :, None], axis=2)  # (Bb, Db, T)
        dA_p = jnp.sum(p2 * dt[:, :, None, :], axis=(0, 3))   # (Db, Np)
    if _abl("gbc"):
        dbc = jnp.zeros((dh.shape[0],) + dh.shape[2:], jnp.float32)
        dcc = dbc
    else:
        dbc = jnp.sum(dh * (dt * u)[:, :, None, :], axis=1)   # (Bb, Np, T)
        dcc = jnp.sum(h_all * gy[:, :, None, :], axis=1)
    return dhB, dadt, dbc, dcc, dA_p, carry_out


def _bwd_kernel_ssd(u_ref, dt_ref, B_ref, C_ref, A_ref, bias_ref, D_ref,
                    st_ref, gy_ref,
                    du_ref, ddt_ref, dB_ref, dC_ref, dA_ref, dbias_ref,
                    dD_ref, dh_scr, dA_scr, dbias_scr, dD_scr,
                    dB_scr, dC_scr,
                    *, l_valid: int, chunk: int, tau,
                    reverse=False, pitch: Optional[int] = None,
                    elem_len: Optional[int] = None):
    # grid = (group, batch_block, L_chunk, d_block) -- d_block INNERMOST so
    # the j-independent B/C input blocks stay VMEM-resident across the
    # d-block sweep and dB/dC accumulate in VMEM instead of materializing
    # nd-expanded HBM tensors reduced outside the kernel
    b_id = pl.program_id(1)
    nb = pl.num_programs(1)
    t = pl.program_id(2)
    nc = pl.num_programs(2)
    j = pl.program_id(3)

    @pl.when(t == 0)
    def _():
        dh_scr[j] = jnp.zeros(dh_scr.shape[1:], dh_scr.dtype)

    # dA/dbias/dD reduce over the OUTER (b, t) grid dims while their output
    # block index tracks the inner j dim: revisits of each output block are
    # non-consecutive. Pallas TPU only documents buffer persistence for
    # consecutive same-block iterations, so accumulate into j-indexed VMEM
    # scratch and write each block once on its final visit. (Measured on this
    # backend the naive += also happened to be correct -- tools/repro_advice.py
    # nd=8, batch-grid 8, nc=2 -- but that is observed, not guaranteed.)
    @pl.when(jnp.logical_and(b_id == 0, t == 0))
    def _():
        dA_scr[j] = jnp.zeros(dA_scr.shape[1:], dA_scr.dtype)
        dbias_scr[j] = jnp.zeros(dbias_scr.shape[1:], dbias_scr.dtype)
        dD_scr[j] = jnp.zeros(dD_scr.shape[1:], dD_scr.dtype)

    u = u_ref[:, 0].astype(jnp.float32)                # (Bb, Db, T)
    dt_raw = dt_ref[:, 0].astype(jnp.float32) + bias_ref[0, 0, :, :]
    dt0 = jax.nn.softplus(dt_raw)
    sig = jax.nn.sigmoid(dt_raw)
    A = A_ref[0]                                       # (Db, N)
    Bc = B_ref[:, 0].astype(jnp.float32)               # (Bb, N, T)
    Cc = C_ref[:, 0].astype(jnp.float32)
    gy0 = gy_ref[:, 0].astype(jnp.float32)             # (Bb, Db, T)
    h0 = st_ref[:, 0, 0]                               # (Bb, Db, N)

    if pitch is not None and elem_len is not None and elem_len < pitch:
        # packed tails: must match the forward's dt masking exactly
        inelem = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, chunk), 2) % pitch
        dt0 = jnp.where(inelem < elem_len, dt0, 0.0)

    def _go(rv_dir: bool):
        dt, gy = dt0, gy0
        if pitch is None and l_valid % chunk != 0:
            # buffer chunk index: the bwd walks processed chunks in reverse
            c = t if rv_dir else (nc - 1 - t)
            pos = c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, chunk), 2)
            valid = pos < l_valid
            dt = jnp.where(valid, dt, 0.0)
            gy = jnp.where(valid, gy, 0.0)
        parts = _tau_parts(tau, A.shape[-1])
        carry_full = dh_scr[j]                         # (Bb, Db, N)
        dhB = dadt = None
        dbcs, dccs, dAs, carries = [], [], [], []
        for s0, s1, tau_p in parts:
            dhB_p, dadt_p, dbc_p, dcc_p, dA_p, carry_p = _part_bwd(
                dt, u, gy, _slice_n(A, s0, s1, 1), _slice_n(Bc, s0, s1, 1),
                _slice_n(Cc, s0, s1, 1), _slice_n(h0, s0, s1, 2),
                _slice_n(carry_full, s0, s1, 2), chunk, tau_p, rv_dir, pitch)
            dhB = dhB_p if dhB is None else dhB + dhB_p
            dadt = dadt_p if dadt is None else dadt + dadt_p
            dbcs.append(dbc_p)
            dccs.append(dcc_p)
            dAs.append(dA_p)
            carries.append(carry_p)
        dh_scr[j] = (carries[0] if len(carries) == 1
                     else jnp.concatenate(carries, -1))
        du_out = dt * dhB + D_ref[0, 0, :, :] * gy
        ddt_raw = (u * dhB + dadt) * sig

        du_ref[:, 0] = du_out.astype(du_ref.dtype)
        ddt_ref[:, 0] = ddt_raw.astype(ddt_ref.dtype)
        # dB/dC blocks are j-independent: accumulated in fp32 VMEM scratch
        # across the innermost d-block sweep, written once per (group, batch,
        # chunk) in the output dtype (bf16 cotangents in bf16 block mode --
        # same single final rounding the external cast used to apply)
        dbc = dbcs[0] if len(dbcs) == 1 else jnp.concatenate(dbcs, axis=1)
        dcc = dccs[0] if len(dccs) == 1 else jnp.concatenate(dccs, axis=1)
        nd_j = pl.num_programs(3)

        @pl.when(j == 0)
        def _():
            dB_scr[...] = dbc
            dC_scr[...] = dcc

        @pl.when(j > 0)
        def _():
            dB_scr[...] += dbc
            dC_scr[...] += dcc

        @pl.when(j == nd_j - 1)
        def _():
            dB_ref[:, 0] = dB_scr[...].astype(dB_ref.dtype)
            dC_ref[:, 0] = dC_scr[...].astype(dC_ref.dtype)

        dA_scr[j] += (dAs[0] if len(dAs) == 1
                      else jnp.concatenate(dAs, axis=-1))
        dbias_scr[j] += jnp.sum(ddt_raw, axis=(0, 2))[:, None]
        dD_scr[j] += jnp.sum(gy * u, axis=(0, 2))[:, None]

    if isinstance(reverse, tuple):                     # ("mixed", n_fwd)
        n_fwd = reverse[1]
        g_id = pl.program_id(0)

        @pl.when(g_id < n_fwd)
        def _():
            _go(False)

        @pl.when(g_id >= n_fwd)
        def _():
            _go(True)
    else:
        _go(bool(reverse))

    @pl.when(jnp.logical_and(b_id == nb - 1, t == nc - 1))
    def _():
        dA_ref[0] = dA_scr[j]
        dbias_ref[0, 0, :, :] = dbias_scr[j]
        dD_ref[0, 0, :, :] = dD_scr[j]


# ---------------------------------------------------------------------------
# Round-1 backward kernel (doubling scans), MEDMAMBA_SCAN_KERNEL=hillis
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
    gy = gy_ref[:, 0].astype(jnp.float32)              # (B_blk, D_blk, T)
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
                l_valid: int, reverse=False,
                pitch: Optional[int] = None,
                elem_len: Optional[int] = None,
                tau: Optional[int] = None, grad_dtypes=None):
    bb, g_u, dpg, lp = u.shape
    g = B.shape[1]
    n = A.shape[-1]
    nc = lp // chunk
    rev_mode = _norm_reverse(reverse, g)
    # du/ddt/dB/dC leave the kernel already in the caller's cotangent dtypes
    # (grad_dtypes aligns with in_dtypes); fp32 when unspecified
    gdt = [jnp.dtype(x) for x in (grad_dtypes or ("float32",) * 7)]

    def rev(t):
        return nc - 1 - t

    def data_t(gg, t):
        # processed chunks run in reverse; for reversed scans that is buffer
        # order first-to-last
        if rev_mode is True:
            return t
        if rev_mode is False:
            return nc - 1 - t
        return jnp.where(gg >= rev_mode[1], t, nc - 1 - t)

    if _kernel_impl() == "ssd":
        # see _fwd_pallas: the SSD backward holds the most live cubes
        # (fwd recompute + adjoint scan + gradient products)
        b_blk, dblk = _pick_blocks(bb, dpg, n, chunk,
                                   vmem_cube_budget=int(os.environ.get(
                                       "MEDMAMBA_SCAN_CUBE_BUDGET_BWD",
                                       512 * 1024)))
        kernel = functools.partial(_bwd_kernel_ssd, l_valid=l_valid,
                                   chunk=chunk,
                                   tau=_norm_tau_arg(tau, chunk),
                                   reverse=rev_mode, pitch=pitch,
                                   elem_len=elem_len)
        nd = dpg // dblk
        # d-block innermost: B/C blocks and the dB/dC accumulators are
        # j-independent and stay VMEM-resident across the d-block sweep
        grid = (g, bb // b_blk, nc, nd)
        du, ddt, dB, dC, dA, dbias, dD = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b_blk, 1, dblk, chunk),
                             lambda gg, b, t, j: (b, gg % g_u, j,
                                                  data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, dblk, chunk),
                             lambda gg, b, t, j: (b, gg, j, data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, n, chunk),
                             lambda gg, b, t, j: (b, gg, 0, data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, n, chunk),
                             lambda gg, b, t, j: (b, gg, 0, data_t(gg, t))),
                pl.BlockSpec((1, dblk, n), lambda gg, b, t, j: (gg, j, 0)),
                pl.BlockSpec((1, 1, dblk, 1),
                             lambda gg, b, t, j: (gg, j, 0, 0)),
                pl.BlockSpec((1, 1, dblk, 1),
                             lambda gg, b, t, j: (gg, j, 0, 0)),
                pl.BlockSpec((b_blk, 1, 1, dblk, n),
                             lambda gg, b, t, j: (b, gg, rev(t), j, 0)),
                pl.BlockSpec((b_blk, 1, dblk, chunk),
                             lambda gg, b, t, j: (b, gg, j, data_t(gg, t))),
            ],
            out_specs=[
                pl.BlockSpec((b_blk, 1, dblk, chunk),
                             lambda gg, b, t, j: (b, gg, j, data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, dblk, chunk),
                             lambda gg, b, t, j: (b, gg, j, data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, n, chunk),
                             lambda gg, b, t, j: (b, gg, 0, data_t(gg, t))),
                pl.BlockSpec((b_blk, 1, n, chunk),
                             lambda gg, b, t, j: (b, gg, 0, data_t(gg, t))),
                pl.BlockSpec((1, dblk, n), lambda gg, b, t, j: (gg, j, 0)),
                pl.BlockSpec((1, 1, dblk, 1),
                             lambda gg, b, t, j: (gg, j, 0, 0)),
                pl.BlockSpec((1, 1, dblk, 1),
                             lambda gg, b, t, j: (gg, j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bb, g, dpg, lp), gdt[0]),
                jax.ShapeDtypeStruct((bb, g, dpg, lp), gdt[1]),
                jax.ShapeDtypeStruct((bb, g, n, lp), gdt[3]),
                jax.ShapeDtypeStruct((bb, g, n, lp), gdt[4]),
                jax.ShapeDtypeStruct((g, dpg, n), jnp.float32),
                jax.ShapeDtypeStruct((g, nd, dblk, 1), jnp.float32),
                jax.ShapeDtypeStruct((g, nd, dblk, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((nd, b_blk, dblk, n), jnp.float32),
                            pltpu.VMEM((nd, dblk, n), jnp.float32),
                            pltpu.VMEM((nd, dblk, 1), jnp.float32),
                            pltpu.VMEM((nd, dblk, 1), jnp.float32),
                            pltpu.VMEM((b_blk, n, chunk), jnp.float32),
                            pltpu.VMEM((b_blk, n, chunk), jnp.float32)],
            # no dimension_semantics: declaring dims parallel was measured
            # ~10% SLOWER here, and every dim carries some accumulation
            interpret=_interpret(),
        )(u, delta, B, C, A,
          bias.reshape(g, nd, dblk, 1), D.reshape(g, nd, dblk, 1),
          states, gy)
        return (du, ddt, dB, dC, dA,
                dbias.reshape(g, dpg), dD.reshape(g, dpg))

    assert rev_mode is False and pitch is None and g_u == g, \
        "reverse/packed/shared-u scans require the ssd kernel"
    b_blk, dblk = _pick_blocks(bb, dpg, n, chunk,
                               vmem_cube_budget=1024 * 1024)
    kernel = functools.partial(_bwd_kernel, l_valid=l_valid, chunk=chunk)
    nd = dpg // dblk
    grid = (nd, g, bb // b_blk, nc)

    st_spec = pl.BlockSpec((b_blk, 1, 1, dblk, n),
                           lambda j, gg, b, t: (b, gg, rev(t), j, 0))

    du, ddt, dB_exp, dC_exp, dA, dbias, dD = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (b, gg, 0, data_t(gg, t))),
            pl.BlockSpec((1, dblk, n), lambda j, gg, b, t: (gg, j, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, dblk, 1), lambda j, gg, b, t: (gg, j, 0, 0)),
            st_spec,
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
        ],
        out_specs=[
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            pl.BlockSpec((b_blk, 1, dblk, chunk),
                         lambda j, gg, b, t: (b, gg, j, data_t(gg, t))),
            pl.BlockSpec((1, b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (j, b, gg, 0, data_t(gg, t))),
            pl.BlockSpec((1, b_blk, 1, n, chunk),
                         lambda j, gg, b, t: (j, b, gg, 0, data_t(gg, t))),
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


def packing_cap(seq_len: int, chunk: int = DEFAULT_CHUNK,
                candidates=(32, 64, 128)) -> int:
    """Largest tau that keeps the short-L batch-packing density of tau=16.

    Packed stages lay ceil(L/tau)*tau lanes per batch element; a tau that
    inflates that pitch trades packing density for segment length (measured
    net-negative at stage-4 scale in round 3, and the HBM inflation
    (49 -> 128 lanes/element at stage 3 under forced-128) is what OOM'd the
    forced-128 batch-256 bench in round 4). Unpacked stages
    (pitch >= chunk) have no cap. Model code clamps FORCED int taus with
    this (vssm.py); tau_select applies it to the auto selection."""
    pitch16 = -(-seq_len // 16) * 16
    if pitch16 >= chunk:
        return chunk
    cap = 16
    for cand in candidates:
        if cand <= pitch16 and -(-seq_len // cand) * cand == pitch16:
            cap = max(cap, cand)
    return cap


def _pick_chunk(l: int, chunk: int) -> int:
    """Chunk length (MEDMAMBA_SCAN_CHUNK overrides for experiments).

    256-lane chunks were hypothesized to win by amortizing the
    boundary-scan doubling over 2x the lanes (4 levels/256 vs 3/128) and
    halving the chunk-carry count -- MEASURED SLOWER on v5e (stage-1 fwd
    31.7 vs 27.2 ms, fwd+bwd 86.6 vs 75.8): the (T, 2T) cumsum-matmul work
    per element doubles with T and the fixed VMEM cube budget halves
    Bb*Db per program. 128 stays the default everywhere."""
    env = os.environ.get("MEDMAMBA_SCAN_CHUNK")
    if env:
        return min(int(env), _cdiv(l, 128) * 128)
    return min(chunk, _cdiv(l, 128) * 128)


def _layout(u, delta, A, B, C, D, bias, chunk, u_tile=1):
    """(B, D, L) channel layout -> grouped (Bb, G, dpg, Lp) padded layout.

    ``u_tile``: u carries ``G // u_tile`` group slots (SS2D passes its shared
    forward/reverse scan input once); the kernel index maps read group k's u
    from slot ``k % (G // u_tile)``."""
    bb, d, l = delta.shape
    g, n = B.shape[1], B.shape[2]
    dpg = d // g
    lp = _cdiv(l, chunk) * chunk
    pad = lp - l

    def pad_l(x):
        if pad == 0:
            return x
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        return jnp.pad(x, cfg)

    u4 = pad_l(u.reshape(bb, g // u_tile, dpg, l))
    dt4 = pad_l(delta.reshape(bb, g, dpg, l))
    B4 = pad_l(B)
    C4 = pad_l(C)
    A3 = A.reshape(g, dpg, n).astype(jnp.float32)
    D2 = D.reshape(g, dpg).astype(jnp.float32)
    bias2 = bias.reshape(g, dpg).astype(jnp.float32)
    return u4, dt4, A3, B4, C4, D2, bias2, l, lp


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def _scan_core(u, delta, A, B, C, D, bias, chunk, in_dtypes, reverse=False,
               pitch=None, elem_len=None, tau=None, u_tile=1, out_dtype=None,
               valid_len=None):
    (y, _last), _res = _scan_core_fwd(u, delta, A, B, C, D, bias, chunk,
                                      reverse, pitch, elem_len, tau, u_tile,
                                      out_dtype, valid_len)
    return y


def _scan_core_fwd(u, delta, A, B, C, D, bias, chunk, reverse=False,
                   pitch=None, elem_len=None, tau=None, u_tile=1,
                   out_dtype=None, valid_len=None):
    bb, d, l = delta.shape
    u4, dt4, A3, B4, C4, D2, bias2, l, lp = _layout(
        u, delta, A, B, C, D, bias, chunk, u_tile)
    y4, states, last = _fwd_pallas(u4, dt4, A3, B4, C4, D2, bias2, chunk,
                                   valid_len or l,
                                   reverse=reverse, pitch=pitch,
                                   elem_len=elem_len, tau=tau,
                                   out_dtype=out_dtype)
    y = y4.reshape(bb, d, lp)[:, :, :l]
    res = (u4, dt4, A3, B4, C4, D2, bias2, states)
    return (y, last.reshape(bb, d, -1)), res


def _vjp_fwd(u, delta, A, B, C, D, bias, chunk, in_dtypes, reverse=False,
             pitch=None, elem_len=None, tau=None, u_tile=1, out_dtype=None,
             valid_len=None):
    (y, _last), res = _scan_core_fwd(u, delta, A, B, C, D, bias, chunk,
                                     reverse, pitch, elem_len, tau, u_tile,
                                     out_dtype, valid_len)
    return y, res


def _vjp_bwd(chunk, in_dtypes, reverse, pitch, elem_len, tau, u_tile,
             out_dtype, valid_len, res, gy):
    u4, dt4, A3, B4, C4, D2, bias2, states = res
    bb, g, dpg, lp = dt4.shape
    d = g * dpg
    n = A3.shape[-1]
    l = gy.shape[-1]
    if lp != l:
        gy = jnp.pad(gy, ((0, 0), (0, 0), (0, lp - l)))
    gy4 = gy.reshape(bb, g, dpg, lp)
    du, ddt, dB, dC, dA, dbias, dD = _bwd_pallas(
        u4, dt4, A3, B4, C4, D2, bias2, states, gy4, chunk, valid_len or l,
        reverse=reverse, pitch=pitch, elem_len=elem_len, tau=tau,
        grad_dtypes=in_dtypes)
    if u_tile > 1:
        # the shared u fed every tiled group: sum their cotangents
        du = du.reshape(bb, u_tile, g // u_tile, dpg, lp).sum(axis=1)
    du = du.reshape(bb, d // u_tile, lp)[:, :, :l]
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
    reverse_dirs: Optional[Tuple[bool, ...]] = None,
    tau: Optional[int] = None,
    u_tile: int = 1,
    out_dtype=None,
    valid_len: Optional[int] = None,
):
    """Fused selective scan with the MedMamba.py:273-279 call-site contract.

    The fused path requires delta_softplus=True (always the case in SS2D);
    D/delta_bias default to zeros when omitted.

    ``reverse_dirs``: optional per-GROUP flags; flagged groups are scanned
    right-to-left with outputs in buffer order, so MedMamba's flipped
    directions (``torch.flip`` at MedMamba.py:257/:282) need no materialized
    flipped copies. A False-prefix/True-suffix pattern (SS2D's layout) runs
    as ONE kernel launch with per-group direction branches; other mixed
    patterns split into direction-homogeneous invocations.

    ``u_tile``: u carries only ``g // u_tile`` groups of channels; scan group
    k reads u group ``k % (g // u_tile)`` inside the kernel (no duplicated
    HBM buffer). SS2D uses u_tile=2: directions 2/3 scan the same buffers as
    0/1, just in reverse.

    ``tau``: int segment length, or the fused mixed-tau n-split
    ``(m, tau_hi, tau_lo)`` -- state dims [0:m] run their within-chunk
    machinery at tau_hi and [m:] at tau_lo inside the SAME launch, sharing
    every N-independent stream (see ``_tau_parts``); callers pre-permute
    A/B/C's state dims so the tau_hi-safe lanes come first.

    ``out_dtype``: y's dtype (default float32, the reference scan contract).
    SS2D passes its block dtype: in bf16 mode the model cast y immediately
    anyway, so emitting bf16 from the kernel is bit-identical and halves the
    y write + gy read traffic (grad cotangents likewise leave the kernel in
    the input dtypes).

    ``valid_len``: the arrays arrive already zero-padded along L to a
    multiple of the chunk; only the first ``valid_len`` positions are real.
    The kernel applies its usual last-chunk dt/gy masking at ``valid_len``
    (pad: decay 1, inject 0) and y returns at the padded length. Lets SS2D
    pad each stage ONCE instead of the wrapper padding u/dt/B/C separately
    per call. Mutually exclusive with the short-L packed path.
    """
    if u_tile > 1 and (not delta_softplus or _kernel_impl() != "ssd"):
        # fallback paths have no shared-u index maps: materialize the tile
        u = jnp.concatenate([u] * u_tile, axis=1)
        u_tile = 1
    if not delta_softplus:
        from medmamba_tpu.ops.selective_scan import (_flip_group_seqs,
                                                     selective_scan_assoc)
        u, delta, B, C = _flip_group_seqs(u, delta, B, C, reverse_dirs)
        out = selective_scan_assoc(u, delta, A, B, C, D,
                                   delta_bias=delta_bias,
                                   delta_softplus=False,
                                   return_last_state=return_last_state)
        y = out[0] if return_last_state else out
        y = _flip_y(y, B.shape[1], reverse_dirs)
        return (y, out[1]) if return_last_state else y

    d = delta.shape[1]
    g = B.shape[1]
    if D is None:
        D = jnp.zeros((d,), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d,), jnp.float32)

    flags = tuple(bool(f) for f in (reverse_dirs or ()))
    if flags and len(flags) != g:
        raise ValueError(f"reverse_dirs has {len(flags)} flags for {g} groups")
    if flags and any(flags) and _kernel_impl() != "ssd":
        # the hillis fallback kernel has no native reverse path: flip
        from medmamba_tpu.ops.selective_scan import _flip_group_seqs, _flip_y
        if valid_len is not None:
            # mask BEFORE flipping: the pad (tail here, front after the flip
            # for flagged groups) must carry dt = 0 in either position
            pos = jnp.arange(u.shape[-1])
            delta = jnp.where(pos[None, None, :] < valid_len, delta, -1e4)
            valid_len = None
        u, delta, B, C = _flip_group_seqs(u, delta, B, C, flags)
        out = selective_scan_pallas(u, delta, A, B, C, D,
                                    delta_bias=delta_bias, delta_softplus=True,
                                    return_last_state=return_last_state,
                                    chunk=chunk)
        y = out[0] if return_last_state else out
        y = _flip_y(y, g, flags)
        return (y, out[1]) if return_last_state else y
    mixed_sorted = False
    if flags and any(flags) and not all(flags):
        n_fwd = flags.index(True)
        mixed_sorted = flags == (False,) * n_fwd + (True,) * (g - n_fwd)
    if flags and any(flags) and not all(flags) and not mixed_sorted:
        # arbitrarily interleaved directions: split into two
        # direction-homogeneous calls (the single-launch fast path below
        # handles the False-prefix/True-suffix layout SS2D uses)
        if u_tile > 1:
            u = jnp.concatenate([u] * u_tile, axis=1)
            u_tile = 1
        fw = tuple(k for k in range(g) if not flags[k])
        rv = tuple(k for k in range(g) if flags[k])
        dpg = d // g

        import numpy as _np

        def pick(idx, rev_flag):
            sel = _np.asarray(idx)
            args = (
                u.reshape(-1, g, dpg, u.shape[-1])[:, sel].reshape(
                    u.shape[0], len(sel) * dpg, u.shape[-1]),
                delta.reshape(-1, g, dpg, u.shape[-1])[:, sel].reshape(
                    u.shape[0], len(sel) * dpg, u.shape[-1]),
                A.reshape(g, dpg, -1)[sel].reshape(len(sel) * dpg, -1),
                B[:, sel], C[:, sel],
                D.reshape(g, dpg)[sel].reshape(-1),
                delta_bias.reshape(g, dpg)[sel].reshape(-1),
            )
            return selective_scan_pallas(
                *args, delta_softplus=True,
                return_last_state=return_last_state, chunk=chunk,
                reverse_dirs=(rev_flag,) * len(sel), tau=tau,
                out_dtype=out_dtype, valid_len=valid_len)

        out_f = pick(fw, False)
        out_r = pick(rv, True)

        def stitch(a, b):  # reassemble groups in original order
            ga = a.reshape(a.shape[0], len(fw), dpg, *a.shape[2:])
            gb = b.reshape(b.shape[0], len(rv), dpg, *b.shape[2:])
            slots = [None] * g
            for i, k in enumerate(fw):
                slots[k] = ga[:, i]
            for i, k in enumerate(rv):
                slots[k] = gb[:, i]
            return jnp.concatenate(slots, axis=1)

        if return_last_state:
            return (stitch(out_f[0], out_r[0]), stitch(out_f[1], out_r[1]))
        return stitch(out_f, out_r)

    # uniform direction -> bool; sorted mixed -> the per-group tuple (one
    # launch, per-group direction branches inside the kernel)
    reverse = flags if mixed_sorted else bool(flags and all(flags))
    bb = u.shape[0]
    l = u.shape[-1]
    if valid_len is not None:
        # pre-padded by less than one chunk: the kernel's last-chunk masking
        # covers exactly this case (pad chunks beyond it would scan garbage)
        assert l == _cdiv(valid_len, DEFAULT_CHUNK) * DEFAULT_CHUNK, \
            f"valid_len={valid_len} needs arrays padded to the next chunk"
    c = _pick_chunk(l, chunk)
    in_dtypes = tuple(str(x.dtype) for x in
                      (u, delta, A, B, C, D, delta_bias))

    # Batch packing for short sequences (VSSM stage 4: L=49 would waste 62%
    # of the 128 lanes): lay chunk//pitch batch elements side by side along
    # the lane axis, each padded to a whole number of tau segments; in-kernel
    # reset masks (see _pack_reset_mask) decouple them. Zero-padded inputs
    # need no extra validity masking: pad decay factors cancel in all E*F
    # pairwise differences and only feed reset-blocked segment boundaries.
    tau = _norm_tau_arg(tau, c)
    if isinstance(tau, tuple):
        # fused mixed-tau n-split (m, tau_hi, tau_lo): state dims [0:m] run
        # at tau_hi, [m:] at tau_lo, in ONE launch (see _tau_parts). The
        # packing pitch must be a whole number of BOTH parts' segments:
        # tau_hi (the larger; taus are powers of two, so tau_lo divides it).
        _m, _t_hi, _t_lo = tau
        assert c % _t_hi == 0 and _t_hi % _t_lo == 0, \
            f"nsplit taus {tau} must divide chunk={c} and nest"
        tau_pack = _t_hi
    else:
        assert c % tau == 0, f"tau={tau} must divide chunk={c}"
        tau_pack = tau
    if (valid_len is None and not return_last_state
            and _kernel_impl() == "ssd"
            and os.environ.get("MEDMAMBA_SCAN_PACK", "1") != "0"):
        p_cand = _cdiv(l, tau_pack) * tau_pack
        if p_cand < c and c % p_cand == 0 and bb % (c // p_cand) == 0:
            pitch = p_cand
            npack = c // pitch
            pad = pitch - l

            def pack(x):
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
                x = x.reshape((bb // npack, npack) + x.shape[1:])
                x = jnp.moveaxis(x, 1, -2)
                return x.reshape(x.shape[:-2] + (npack * pitch,))

            y = _scan_core(pack(u), pack(delta),
                           jnp.asarray(A, jnp.float32), pack(B), pack(C),
                           D, delta_bias, c, in_dtypes, reverse, pitch, l,
                           tau, u_tile, out_dtype)
            y = y.reshape(y.shape[:-1] + (npack, pitch))
            y = jnp.moveaxis(y, -2, 1)
            return y.reshape((bb,) + y.shape[2:])[..., :l]

    if return_last_state:
        assert valid_len is None, "valid_len + return_last_state unsupported"
        (y, last), _ = _scan_core_fwd(u, delta, jnp.asarray(A, jnp.float32),
                                      B, C, D, delta_bias, c, reverse,
                                      tau=tau, u_tile=u_tile)
        return y, last
    return _scan_core(u, delta, jnp.asarray(A, jnp.float32), B, C, D,
                      delta_bias, c, in_dtypes, reverse, None, None, tau,
                      u_tile, out_dtype, valid_len)
