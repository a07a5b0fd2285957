"""HBM footprint ledger (VERDICT r4 next #4): per-config live-buffer peaks.

Round 4 left the forced-128 batch-256 HBM OOM "deliberately undiagnosed" and
docs carried no memory budget at all. This tool compiles the full train step
per (batch, tau) configuration and reads XLA's ``memory_analysis()`` off the
executable -- argument/output/temp/generated-code sizes -- WITHOUT executing,
so even configurations that OOM at allocation time can be measured (compile
succeeds; the allocator fails only on run). Results feed the budget table in
docs/DESIGN.md ("HBM footprint ledger").

Run on the TPU (one process at a time; uses the compilation cache):
    python tools/hbm_ledger.py --batches 64,128,256 --taus auto,128
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Named tau specs. NOTE the kernel clip is read at import
# (MEDMAMBA_SCAN_CLIP): run "outcome" at clip 20 and the clip-80 specs in a
# separate process to match the executables production actually runs.
SPECS = {
    # round-5 outcome-gate selection at trained magnitudes (clip 20)
    "outcome": (128, 128, 128, 64),
    # round-4 exact-gate trained-regime selection (clip 80)
    "r4auto": (("nsplit", tuple(range(16)), 8, 128, 64),
               ("nsplit", tuple(range(16)), 8, 128, 64),
               ("nsplit", tuple(range(16)), 8, 128, 64), 64),
    # the round-4 forced-128 config incl. UNPACKED stage 3 (the b256 OOM;
    # a tuple bypasses the round-5 packing clamp on purpose -- this row IS
    # the diagnosis)
    "f128raw": (128, 128, 128, 128),
}


def analyze(batch: int, tau, image_size: int = 224, size: str = "T"):
    if isinstance(tau, str):
        tau = SPECS[tau]
    import jax
    import numpy as np

    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
    from medmamba_tpu.train.trainer import init_state, make_optimizer, train_step

    import jax.numpy as jnp

    # bf16 blocks + fp32 scan core: the production/bench configuration --
    # also what the compile cache holds (a dtype mismatch here recompiles
    # fresh, and b256-sized fresh compiles crash the tunnel's helper)
    model = create_model(size, 9, scan_impl="auto", scan_tau=tau,
                         dtype=jnp.bfloat16)
    tx = make_optimizer(1e-3, npz_mode=True)
    state = init_state(model, jax.random.key(0), tx,
                       input_shape=(1, image_size, image_size, 3))
    mesh = make_mesh()
    state = replicate_state(state, mesh)
    imgs, lbls = shard_batch(mesh, np.zeros((batch, image_size, image_size, 3),
                                            np.uint8),
                             np.zeros((batch,), np.int64))
    gib = 1024 ** 3
    if os.environ.get("HBM_LEDGER_RUNSTATS"):
        # Execute ONE step through the normal jit path (persistent-cache
        # eligible -- AOT .lower().compile() bypasses that cache and large
        # configs crash the tunnel's compile helper) and read the device
        # allocator's live/peak counters. Includes allocator overhead: the
        # practical budget number.
        new_state, loss = train_step(state, imgs, lbls, jax.random.key(1),
                                     augment=True, image_size=image_size)
        jax.block_until_ready(loss)
        ms = jax.local_devices()[0].memory_stats() or {}
        return {
            "size": size, "batch": batch, "tau": str(tau), "mode": "runstats",
            "image_size": image_size, "loss": float(loss),
            "peak_gib": round(ms.get("peak_bytes_in_use", 0) / gib, 3),
            "limit_gib": round(ms.get("bytes_limit", 0) / gib, 3),
        }
    lowered = train_step.lower(state, imgs, lbls, jax.random.key(1),
                               augment=True, image_size=image_size)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    rec = {
        "size": size, "batch": batch, "tau": str(tau),
        "image_size": image_size,
        "argument_gib": round(ma.argument_size_in_bytes / gib, 3),
        "output_gib": round(ma.output_size_in_bytes / gib, 3),
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
        "code_gib": round(ma.generated_code_size_in_bytes / gib, 3),
        # peak live = args + outputs + temps - aliased (donated args overlap
        # outputs); code is instruction memory, kept separate
        "peak_live_gib": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / gib, 3),
    }
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--taus", default="outcome")
    p.add_argument("--size", default="T")
    p.add_argument("--out", default="docs/experiments/hbm_ledger_r05.jsonl")
    args = p.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    outp = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    with open(outp, "a") as f:
        for tau in args.taus.split(","):
            for b in (int(x) for x in args.batches.split(",")):
                try:
                    rec = analyze(b, tau if tau in SPECS else int(tau),
                                  size=args.size)
                except Exception as e:  # record failures too (OOM compiles)
                    rec = {"size": args.size, "batch": b, "tau": tau,
                           "error": f"{type(e).__name__}: {e}"[:500]}
                print(json.dumps(rec))
                f.write(json.dumps(rec) + "\n")
                f.flush()


if __name__ == "__main__":
    main()
