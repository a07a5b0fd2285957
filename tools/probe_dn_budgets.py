"""Measure the per-(channel, state-dim) spread of the scan exactness budgets.

The tau selector's budget matrix is per state dim n (max over channels d):
the mixed-tau "nsplit" path exploits the n spread (|A[:, n]| ~ n at the S4D
init). This probe asks whether a CHANNEL-level split has headroom on top:
for the lanes n that hold the lo part at tau_lo, what fraction of channels
would individually fit tau_hi? If that fraction is large, partitioning the
d axis into two scan launches (disjoint channel slices -- no duplicated
streams, unlike the n-split's shared u/dt) could move more cube volume to
the faster segment length.

Run on CPU:
    JAX_PLATFORMS=cpu python tools/probe_dn_budgets.py [--image_size 224]
        [--npz <images.npy>] [--batch 8] [--margin 0.9]

Prints, per stage and per candidate tau: the fraction of (d, n) lanes within
the limit, the fraction of channels with ALL lanes within the limit, and --
for the lanes the per-n selector would put in the lo part at margin 0.9 --
the fraction of channels that individually fit each faster tau.
"""
from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["MEDMAMBA_SOW_DN_BUDGETS"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from medmamba_tpu.models.registry import create_model
from medmamba_tpu.models.vssm import SCAN_TAU_CANDIDATES
from medmamba_tpu.ops.pallas_scan import _CLIP
from medmamba_tpu.train import tau_select


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="T")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--margin", type=float, default=0.9)
    ap.add_argument("--npz", default=None,
                    help="optional (N,H,W,3) .npy of preprocessed images")
    args = ap.parse_args()

    model = create_model(args.model, num_classes=9)
    rng = np.random.RandomState(0)
    if args.npz:
        images = np.load(args.npz)[: args.batch].astype(np.float32)
    else:
        images = rng.randn(args.batch, args.image_size, args.image_size,
                           3).astype(np.float32)

    variables = model.init(jax.random.key(0), images[:1],
                           deterministic=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    calib = model.clone(use_checkpoint=False, scan_tau=tau_select.SAFE_FLOOR)
    _, stats = calib.apply(
        {"params": params, "batch_stats": batch_stats}, images,
        deterministic=False,
        rngs={"dropout": jax.random.key(1), "droppath": jax.random.key(2)},
        mutable=["scan_stats", "batch_stats"])

    # collect per-stage tuples of (d_inner, N) matrices, one per candidate
    leaves = jax.tree_util.tree_flatten_with_path(
        jax.device_get(stats["scan_stats"]))[0]
    per_stage: dict[int, list[list[np.ndarray]]] = {}
    for path, leaf in leaves:
        names = [getattr(k, "key", None) for k in path]
        if "seg_budget_dn" not in names:
            continue
        stage = next(int(n.split("_")[1]) for n in names
                     if isinstance(n, str) and n.startswith("layers_"))
        arr = np.asarray(leaf, np.float32)
        # sow appends per call: _sow_seg_budgets runs once per direction
        # pair (2x per SS2D), each appending one entry per candidate, so the
        # candidate index cycles with period |SCAN_TAU_CANDIDATES|
        cand_i = next(k.idx for k in path if hasattr(k, "idx"))
        cand_i %= len(SCAN_TAU_CANDIDATES)
        per_stage.setdefault(stage, [[] for _ in SCAN_TAU_CANDIDATES])
        per_stage[stage][cand_i].append(arr)

    limit = args.margin * 2.0 * _CLIP
    print(f"limit = {limit:.0f}  (margin {args.margin} x 2*CLIP)")
    for stage in sorted(per_stage):
        mats = [np.maximum.reduce(ms) for ms in per_stage[stage]]
        print(f"\nstage {stage}: d_inner={mats[0].shape[0]} "
              f"N={mats[0].shape[1]}")
        for ci, tau_c in enumerate(SCAN_TAU_CANDIDATES):
            m = mats[ci]
            lane_fit = m <= limit
            ch_all = lane_fit.all(axis=1)
            per_n_max = m.max(axis=0)
            lo_lanes = np.where(per_n_max > limit)[0]
            msg = (f"  tau={tau_c:>3}: lanes fit {lane_fit.mean():5.1%}  "
                   f"channels all-fit {ch_all.mean():5.1%}  "
                   f"per-n-max fit {(per_n_max <= limit).mean():5.1%}")
            if lo_lanes.size:
                ch_fit_lo = lane_fit[:, lo_lanes].all(axis=1)
                msg += (f"  | lo-part lanes n={lo_lanes.min()}..{lo_lanes.max()}"
                        f" ({lo_lanes.size}): channels fitting them "
                        f"{ch_fit_lo.mean():5.1%}")
            print(msg)


if __name__ == "__main__":
    main()
