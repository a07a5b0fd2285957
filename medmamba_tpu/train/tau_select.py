"""Host-side scan-tau selection (safe-by-measurement kernel fast path).

The Pallas selective-scan kernel factors each tau-segment's decay products as
clipped exponentials; the factorization is exact while

    |A[d, n] * seg_sum(dt[d])| <= 2 * CLIP        (per tau-aligned segment)

and silently distorts near-diagonal decay ratios beyond it (see the ``_tau``
docstring in ``ops/pallas_scan.py``). Larger tau is measurably faster
(tau=32: ~-15%/step, round 2; tau=chunk eliminates the segment-boundary
machinery entirely via the compact nseg==1 fast path, round 3) but the safe
range shrinks linearly with tau. This module implements the selection the
round-2 verdict asked for: measure the actual |A| * seg_sum(dt) magnitudes of
the trained model on real data (a few device reductions, sown by SS2D into
the ``scan_stats`` collection), then pick the largest candidate tau whose
worst-case segment stays inside the clip budget with margin. tau=16 is the
always-safe floor (the round-2 default).

Reference context: the CUDA kernel the reference links
(``/root/reference/MedMamba.py:273-279``) has no such range/speed dial; this
is a TPU-specific optimization with a safety gate, not a parity surface.
"""
from __future__ import annotations

import functools
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from medmamba_tpu.models.vssm import SCAN_TAU_CANDIDATES
from medmamba_tpu.ops.pallas_scan import _CLIP, DEFAULT_CHUNK

log = logging.getLogger("medmamba_tpu.tau_select")

SAFE_FLOOR = 16  # always-exact default segment length

# Mixed-tau n-split granule: n-subsets are fp32 sublane-tiled in the kernel's
# (Bb, Db, N, T) cubes, so subsets smaller than 8 pad back up to 8 and save
# nothing. Splits are multiples of this.
N_GRANULE = 8


@functools.lru_cache(maxsize=4)
def _calib_fn(calib_model, train_mode: bool):
    """The jitted calibration forward, cached on the (canonical) model.

    Cached so the per-epoch recalibration reuses one XLA executable instead
    of recompiling the full VSSM forward every epoch (jax.jit caches per
    wrapper instance; flax modules are frozen dataclasses, so equal clones
    hit the lru_cache).
    """

    @jax.jit
    def calib(p, bs, x, key):
        # The calibration must run in the SAME mode as the forwards it gates:
        # train_mode=True -> BatchNorm normalizes with BATCH statistics (what
        # training steps see; calibrating on running averages -- at epoch 1
        # the init defaults mean 0 / var 1 -- can understate training-time
        # |A|*seg_sum(dt)); the stats update itself is discarded and
        # dropout/drop-path draw from a fixed key. train_mode=False ->
        # running averages + no dropout, the exact serving distribution
        # (checkpoint-load-time selection in the evaluate/demo CLIs).
        if train_mode:
            _, stats = calib_model.apply(
                {"params": p, "batch_stats": bs}, x, False,
                rngs={"dropout": key},
                mutable=["scan_stats", "batch_stats"])
        else:
            _, stats = calib_model.apply(
                {"params": p, "batch_stats": bs}, x, True,
                mutable=["scan_stats"])
        return stats["scan_stats"]

    return calib


def measure_seg_budgets(model, params, batch_stats, images, *,
                        train_mode: bool = True) -> Dict[int, np.ndarray]:
    """One calibration forward; returns per-stage max |A|*seg_sum(dt).

    ``images``: a preprocessed (B, H, W, 3) float batch. Returns
    {stage_index: (len(SCAN_TAU_CANDIDATES), d_state) array} -- per state dim
    n, the max over every SS2D block, direction, channel and tau-aligned
    segment in that stage (the exactness bound is per (d, n) lane; keeping n
    enables the mixed-tau "nsplit" selection).
    ``train_mode``: match the mode of the gated forwards (see _calib_fn).
    """
    # Canonical calibration clone: the sown budgets depend on the activations
    # feeding each stage, not on the kernel's segmentation, so calibrate at
    # the always-exact floor tau (stage-1 inexactness would otherwise leak
    # into later stages' measured dt) -- and keep the clone identical across
    # recalibrations so the jit cache holds as taus change epoch to epoch.
    # (sow-through-remat is not load-bearing anywhere else; use_checkpoint
    # stays off to keep the variable plumbing simple.)
    calib_model = model.clone(use_checkpoint=False, scan_tau=SAFE_FLOOR)

    stats = _calib_fn(calib_model, train_mode)(params, batch_stats, images,
                                               jax.random.key(0))
    leaves = jax.tree_util.tree_flatten_with_path(jax.device_get(stats))[0]
    out: Dict[int, np.ndarray] = {}
    for path, leaf in leaves:
        stage = None
        is_budget = False
        for k in path:
            name = getattr(k, "key", None)
            if isinstance(name, str) and name.startswith("layers_"):
                stage = int(name.split("_")[1])
            # match the sown key EXACTLY: other scan_stats leaves (e.g. the
            # env-gated per-(d, n) diagnostic 'seg_budget_dn') must not be
            # shape-guessed into the budget matrix (code-review round 3)
            is_budget = is_budget or name == "seg_budget"
        if stage is None or not is_budget:
            continue
        arr = np.asarray(leaf, np.float32)
        if arr.ndim != 2 or arr.shape[0] != len(SCAN_TAU_CANDIDATES):
            continue  # pragma: no cover
        prev = out.get(stage)
        out[stage] = arr if prev is None else np.maximum(prev, arr)
    return out


def _stage_seq_lens(image_size: int, patch_size: int = 4,
                    num_stages: int = 4) -> Tuple[int, ...]:
    side = image_size // patch_size
    lens = []
    for _ in range(num_stages):
        lens.append(side * side)
        side //= 2
    return tuple(lens)


def _packing_cap(seq_len: int, chunk: int = DEFAULT_CHUNK) -> int:
    """Largest tau keeping the tau=16 packing density -- delegates to the
    kernel-side ``packing_cap`` (ops/pallas_scan.py), which round 5 also
    applies to FORCED int taus in the model (vssm.py)."""
    from medmamba_tpu.ops.pallas_scan import packing_cap

    return packing_cap(seq_len, chunk, SCAN_TAU_CANDIDATES)


# Per-lane relative scan cost vs segment length, fit to the measured
# per-stage kernel times (fwd+bwd, v5e, DESIGN.md round-3 table): tau 16 ->
# 128 cost ~2.1x over the 8x segment-length span -> cost(tau) ~
# (chunk/tau)**0.36. Only RATIOS between candidates matter here.
_COST_ALPHA = 0.36


def _lane_cost(tau: int, chunk: int = DEFAULT_CHUNK) -> float:
    return (chunk / tau) ** _COST_ALPHA


def _pick_stage_tau(b: Optional[np.ndarray], cap: int, limit: float):
    """Per-stage policy on a (|candidates|, N) per-n budget matrix.

    Returns the largest candidate tau whose budget fits for EVERY state dim
    (the round-3 behavior), or a mixed-tau spec ``("nsplit", perm, m,
    tau_hi, tau_lo)``: state dims ``perm[:m]`` (budget-ascending order) run
    their within-chunk machinery at ``tau_hi``, the rest at ``tau_lo``
    (exact: y = sum_n C_n h_n and the bound is per (d, n) lane). Every
    (tau_hi, m, tau_lo) combination with m a granule multiple is scored by
    the modeled per-lane cost ``_lane_cost`` and the cheapest wins -- taking
    the LARGEST fitting tau_hi unconditionally could pick 8 lanes @128 +
    56 @32 over the far cheaper 56 @64 + 8 @32 when mid-tau coverage is
    much wider (code-review round-3 finding). ``b`` is None for unmeasured
    stages -> the safe floor.
    """
    tau = SAFE_FLOOR
    if b is None:
        return tau
    for i, cand in enumerate(SCAN_TAU_CANDIDATES):
        if cand <= cap and float(np.max(b[i])) <= limit:
            tau = max(tau, cand)
    nst = b.shape[1]
    if nst < 2 * N_GRANULE or nst % N_GRANULE:
        return tau
    best_spec: Any = tau
    best_cost = nst * _lane_cost(tau)
    for i, cand in enumerate(SCAN_TAU_CANDIDATES):
        if cand > cap or cand <= SAFE_FLOOR:
            continue
        m = (int(np.sum(b[i] <= limit)) // N_GRANULE) * N_GRANULE
        if not (N_GRANULE <= m < nst):
            continue  # cand fits (almost) no lanes, or fits all of them
        order = np.argsort(b[i], kind="stable")
        rest = order[m:]
        tau_lo = SAFE_FLOOR
        for j, lo_cand in enumerate(SCAN_TAU_CANDIDATES):
            if (lo_cand < cand and lo_cand <= cap
                    and float(np.max(b[j][rest])) <= limit):
                tau_lo = max(tau_lo, lo_cand)
        if tau_lo >= cand:  # pragma: no cover -- would have been a full fit
            continue
        cost = m * _lane_cost(cand) + (nst - m) * _lane_cost(tau_lo)
        if cost < best_cost - 1e-9:
            best_cost = cost
            # Canonicalize: only the PARTITION matters (any lane order within
            # a part is numerically valid), so sort each part ascending --
            # epoch-to-epoch budget jitter that reorders lanes WITHIN a part
            # then cannot change the spec and force a pointless
            # retrace/recompile of the train step.
            perm = tuple(sorted(int(v) for v in order[:m])) + \
                tuple(sorted(int(v) for v in rest))
            best_spec = ("nsplit", perm, m, cand, tau_lo)
    return best_spec


def _spec_lane_cost(spec) -> float:
    """Modeled average per-lane cost of a per-stage tau spec (int or
    ``('nsplit', perm, m, tau_hi, tau_lo)``), for ordering specs by speed."""
    if isinstance(spec, tuple) and spec and spec[0] == "nsplit":
        _, perm, m, hi, lo = spec
        nst = len(perm)
        return (m * _lane_cost(hi) + (nst - m) * _lane_cost(lo)) / nst
    return _lane_cost(int(spec))


def taus_cost(taus) -> float:
    return sum(_spec_lane_cost(s) for s in taus)


class TauHysteresis:
    """Debounce per-epoch tau-spec changes (VERDICT r4 #5).

    A spec CHANGE costs a retrace (~40 s cache-warm, minutes cold,
    ROUND4_NOTES session 4), so one epoch of budget jitter around a
    threshold must not thrash retraces. The controller requires the SAME
    proposal on ``drop_after`` consecutive recalibrations before switching
    to a slower (more conservative) spec, and ``raise_after`` before a
    faster one; any different proposal resets the streak. The FIRST
    proposal is always adopted (initial calibration).

    ``drop_after=1`` preserves the bit-exact gate's drop-immediately safety
    semantics while still debouncing the raise side; the outcome-based gate
    (see select_scan_tau ``gate='outcome'``) uses ``drop_after=2`` -- its
    limit already carries the measured training-outcome margin, so a
    one-epoch transient may run on the old spec.
    """

    def __init__(self, drop_after: int = 1, raise_after: int = 2):
        self.drop_after = max(1, drop_after)
        self.raise_after = max(1, raise_after)
        self.current: Optional[Tuple[Any, ...]] = None
        self._pending: Optional[Tuple[Any, ...]] = None
        self._streak = 0

    def propose(self, taus: Tuple[Any, ...]) -> Tuple[Tuple[Any, ...], bool]:
        """Feed one recalibration's selection; returns (spec to run, changed)."""
        if self.current is None:
            self.current = taus
            return taus, True
        if taus == self.current:
            self._pending, self._streak = None, 0
            return self.current, False
        if taus == self._pending:
            self._streak += 1
        else:
            self._pending, self._streak = taus, 1
        slower = taus_cost(taus) > taus_cost(self.current)
        need = self.drop_after if slower else self.raise_after
        if self._streak >= need:
            self.current = taus
            self._pending, self._streak = None, 0
            return taus, True
        log.info("tau hysteresis: holding %s (pending %s, streak %d/%d)",
                 self.current, taus, self._streak, need)
        return self.current, False


# Outcome-gate budget limit, ABSOLUTE |A|*seg_sum(dt) scale. Calibrated by
# the round-5 tau A/B (tools/tau_ab.py, ROUND5_NOTES session 2): with the
# runtime clip hardened to 20 (see OUTCOME_SCAN_CLIP), trajectories at
# measured budgets ~205 -- 5.7x past clip-20 bit-exactness -- matched the
# bit-exact gate's within seed noise on every seed (loss curves + final val
# acc, identical init/data); the distorted decay ratios belong to
# numerically-dead states (decay < e^-40 at clip 20 before distortion can
# engage). 400 keeps the drift monitor within ~2x of the measured-safe
# point instead of open-ended.
OUTCOME_BUDGET_LIMIT = 400.0

# Runtime kernel clip for outcome-gated runs (MEDMAMBA_SCAN_CLIP): the A/B's
# decisive finding is that the NaN hazard of beyond-budget taus is fp32
# OVERFLOW, not distortion -- at the default clip 80 a beyond-budget segment
# carries F = e^{+80} factors whose within-segment cumsums of F*dt*u*B can
# overflow fp32 once activations grow (forced-128 seed 44 collapsed to NaN
# loss at epoch 4; the SAME seed at clip 20 -- 4x MORE distortion -- trained
# clean, as did all other clip-20 seeds). e^{3*20} is fp32-finite, so clip
# 20 makes overflow impossible by construction while the added distortion
# only touches decays below e^-40.
OUTCOME_SCAN_CLIP = 20.0


def _stage_budget_limit(gate: str, margin: float) -> float:
    if gate == "exact":
        return margin * 2.0 * _CLIP
    if gate == "outcome":
        return margin * OUTCOME_BUDGET_LIMIT
    raise ValueError(f"gate={gate!r}: expected 'exact' or 'outcome'")


def select_scan_tau(model, params, batch_stats, images, *,
                    image_size: int = 224, margin: float = 0.9,
                    num_stages: Optional[int] = None,
                    train_mode: bool = True,
                    gate: str = "exact") -> Tuple[Any, ...]:
    """Pick the per-stage tau: largest candidate inside the clip budget,
    mixed per state dim (``_pick_stage_tau``) when only the high-|A| decay
    lanes hold a stage below a faster tau.

    margin: fraction of the gate's budget limit a segment may use; the
    headroom absorbs drift between recalibrations (the CLI recalibrates every
    epoch and drops tau the moment a measurement exceeds the margin).
    train_mode: calibrate under training-mode (batch-stats) or serving-mode
    (running-average) BatchNorm -- pass False when gating inference forwards
    on a frozen checkpoint (the evaluate/demo CLIs use margin 0.8 there: the
    calibration batch is a sample, not the full stream).
    gate: 'exact' bounds every segment by bit-exactness of the factored scan
    (2*CLIP); 'outcome' bounds by measured TRAINING-OUTCOME safety
    (OUTCOME_BUDGET_LIMIT, the A/B evidence above) and REQUIRES the caller
    to run the kernel at OUTCOME_SCAN_CLIP (the CLIs set MEDMAMBA_SCAN_CLIP
    before importing the kernel; clip 80 with beyond-budget segments is an
    fp32 overflow hazard -- the measured NaN). Beyond-limit measurements
    still drop tau either way (the drift monitor); the exact gate remains
    available for bit-level reproducibility studies.
    """
    if gate == "outcome" and _CLIP > OUTCOME_SCAN_CLIP:
        raise RuntimeError(
            f"gate='outcome' requires the hardened kernel clip "
            f"(MEDMAMBA_SCAN_CLIP={OUTCOME_SCAN_CLIP:g} set before the "
            f"kernel module is imported); running beyond-budget taus at "
            f"clip {_CLIP:g} is an fp32 overflow hazard (measured NaN, "
            f"ROUND5_NOTES session 2).")
    budgets = measure_seg_budgets(model, params, batch_stats, images,
                                  train_mode=train_mode)
    if num_stages is None:
        num_stages = (len(model.depths) if hasattr(model, "depths")
                      else (max(budgets) + 1 if budgets else 0))
    limit = _stage_budget_limit(gate, margin)
    seq_lens = _stage_seq_lens(image_size, num_stages=num_stages)
    taus = []
    for s in range(num_stages):
        b = budgets.get(s)
        cap = _packing_cap(seq_lens[s])
        tau = _pick_stage_tau(b, cap, limit)
        taus.append(tau)
        if b is not None:
            desc = (tau if isinstance(tau, int) else
                    f"{tau[3]}x{tau[2]}/{tau[4]}x{b.shape[1] - tau[2]} lanes")
            log.info("tau-select stage %d: budgets %s (limit %.0f, cap %d) "
                     "-> tau=%s", s,
                     np.array2string(np.max(b, axis=1), precision=1), limit,
                     cap, desc)
    return tuple(taus)
