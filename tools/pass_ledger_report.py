"""Summarize docs/experiments/ledger_r04_raw.jsonl into the pass ledger.

Groups records by (phase, stage, mode, tau): prints nseg2-variant A/Bs and,
for the ablation ledger, each token's measured delta vs the unablated
baseline of the same group, converted to full-cube pass-equivalents with the
roofline's per-pass cost (docs/DESIGN.md "Measured roofline": one pass over
stage-0's share of the cube at batch 64 fp32).
"""
import json
import os
import sys
from collections import defaultdict

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "experiments", "ledger_r04_raw.jsonl")

# stage-0 cube volume share of the model total (2.52 of 5.94 Gelem) x the
# model-wide 3.1 ms/pass  =>  ~1.31 ms per full-cube pass at stage 0.
# Direction layout here is 4 groups in ONE launch (same as production).
STAGE0_PASS_MS = 3.1 * (2.52 / 5.94)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else OUT
    recs = [json.loads(l) for l in open(path) if l.strip()]
    # keep the LAST record per config (reruns supersede)
    by_key = {}
    for r in recs:
        key = (r.get("phase"), r.get("stage"), r.get("mode"), r.get("tau"),
               r.get("nseg2", ""), r.get("ablate", ""))
        by_key[key] = r

    print("== Phase A: nseg2 boundary variants (ms/call) ==")
    for key, r in sorted(by_key.items()):
        if r.get("phase") != "nseg2":
            continue
        print(f"  stage{r['stage']} {r['mode']:4s} tau={r['tau']:<16s} "
              f"{r.get('nseg2', ''):6s}: "
              f"{r['ms']:.2f} ms" if r.get("ms") else f"  {key}: ERROR")

    groups = defaultdict(dict)
    for key, r in by_key.items():
        if r.get("phase") == "ledger" and r.get("ms"):
            groups[(r["stage"], r["mode"], r["tau"])][r.get("ablate", "")] \
                = r["ms"]
    for (stage, mode, tau), d in sorted(groups.items()):
        base = d.get("")
        if base is None:
            continue
        print(f"\n== Ledger stage{stage} {mode} tau={tau}: baseline "
              f"{base:.2f} ms ==")
        rows = []
        for tok, ms in d.items():
            if not tok:
                continue
            delta = base - ms
            rows.append((delta, tok, ms))
        for delta, tok, ms in sorted(rows, reverse=True):
            print(f"  {tok:9s}: {ms:8.2f} ms  delta {delta:7.2f} ms "
                  f"(~{delta / STAGE0_PASS_MS:5.1f} stage0-pass-equiv)")


if __name__ == "__main__":
    main()
