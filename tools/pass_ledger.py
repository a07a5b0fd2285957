"""Per-pass cost ledger of the fused selective-scan kernel (VERDICT r3 #1).

Measures, by ablation, what each kernel piece costs on real hardware: the
parent process runs one CHILD SUBPROCESS per (stage, mode, tau-spec,
ablation-token) -- a fresh process so the env-gated kernel variants
(MEDMAMBA_SCAN_ABLATE / MEDMAMBA_SCAN_NSEG2) trace cleanly and the XLA
compilation cache keys stay honest -- and diffs each ablated time against the
unablated baseline of the same chain. The stubs keep every shape (no DCE of
unrelated pieces) but break numerics; this tool is TIMING ONLY.

Usage:
  python tools/pass_ledger.py                 # full ledger chain -> JSON
  python tools/pass_ledger.py --quick         # nseg2-variant A/B only
  python tools/pass_ledger.py --child ...     # internal (one measurement)

Results append to docs/experiments/ledger_r04_raw.jsonl (one JSON per line).
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "experiments", "ledger_r04_raw.jsonl")

# (d_inner, L) per VSSM-T stage at 224x224
STAGES = [(96, 3136), (192, 784), (384, 196), (768, 49)]

FWD_TOKENS_SPLIT = ["clip", "fneg", "ehalf", "dub", "w", "boundary", "hall",
                    "yc"]
BWD_TOKENS_SPLIT = ["q", "adjb", "dh", "dhb", "gbc", "gadt"]
FWD_TOKENS_128 = ["clip", "fneg", "dub", "w", "yc"]   # compact: no boundary
BWD_TOKENS_128 = ["q", "dh", "dhb", "gbc", "gadt"]


def _parse_tau(spec: str):
    if spec.startswith("nsplit:"):
        m, hi, lo = (int(x) for x in spec.split(":")[1:])
        return (m, hi, lo)
    return int(spec)


def child(stage: int, mode: str, tau_spec: str, batch: int) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax_comp_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from medmamba_tpu.ops.pallas_scan import selective_scan_pallas

    d_inner, l = STAGES[stage]
    d, n, g = 4 * d_inner, 16, 4
    tau = _parse_tau(tau_spec)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((batch, d, l)).astype(np.float32))
    delta = jnp.asarray(
        (0.1 * rng.standard_normal((batch, d, l))).astype(np.float32))
    A = jnp.asarray(-np.exp(
        rng.standard_normal((d, n)).astype(np.float32) * 0.5))
    B = jnp.asarray(rng.standard_normal((batch, g, n, l)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((batch, g, n, l)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    bias = jnp.asarray((0.1 * rng.standard_normal((d,))).astype(np.float32))
    ops = (delta, A, B, C, D, bias)

    # production direction layout: one forward + one reversed pair
    dirs = (False, False, True, True)

    if mode == "fwd":
        def one(x, o):
            return selective_scan_pallas(
                x, o[0], o[1], o[2], o[3], o[4], delta_bias=o[5],
                delta_softplus=True, tau=tau, reverse_dirs=dirs)
    else:
        def one(x, o):
            def loss(xx):
                y = selective_scan_pallas(
                    xx, o[0], o[1], o[2], o[3], o[4], delta_bias=o[5],
                    delta_softplus=True, tau=tau, reverse_dirs=dirs)
                return jnp.sum(y * y)
            return jax.grad(loss)(x)

    @jax.jit
    def run_n(x, o, k):
        def body(i, xx):
            return one(xx, o) * 1e-3
        return jax.lax.fori_loop(0, k, body, x)

    x = run_n(u, ops, 2)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    x = run_n(x, ops, 2)
    float(jnp.sum(x))
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = run_n(x, ops, 12)
    float(jnp.sum(x))
    t12 = time.perf_counter() - t0
    print(json.dumps({"ms": (t12 - t2) / 10 * 1000.0}))


def run_child(cfg: dict, timeout: int = 2400):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    if cfg.get("ablate"):
        env["MEDMAMBA_SCAN_ABLATE"] = cfg["ablate"]
        env["MEDMAMBA_SCAN_ABLATE_OK"] = "1"  # opt past guard_ablation_unset
    else:
        env.pop("MEDMAMBA_SCAN_ABLATE", None)
    if cfg.get("nseg2"):
        env["MEDMAMBA_SCAN_NSEG2"] = cfg["nseg2"]
    else:
        env.pop("MEDMAMBA_SCAN_NSEG2", None)
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--stage", str(cfg["stage"]), "--mode", cfg["mode"],
           "--tau", cfg["tau"], "--batch", str(cfg.get("batch", 64))]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=timeout)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
            else ""
        ms = json.loads(line)["ms"] if line.startswith("{") else None
        err = None if ms is not None else (out.stderr[-500:] or "no output")
    except subprocess.TimeoutExpired:
        ms, err = None, "timeout"
    rec = dict(cfg)
    rec.update({"ms": ms, "wall_s": round(time.time() - t0, 1),
                **({"error": err} if err else {})})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--mode", default="grad")
    ap.add_argument("--tau", default="nsplit:8:128:64")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true",
                    help="nseg2-variant A/B only")
    ap.add_argument("--tokens", default=None,
                    help="comma list: run ONLY these ablation tokens (plus "
                         "baseline) at the nsplit grad config -- the "
                         "trimmed ledger for tight TPU budgets")
    args = ap.parse_args()
    if args.child:
        child(args.stage, args.mode, args.tau, args.batch)
        return

    cfgs = []
    if args.tokens is not None:
        cfgs.append({"phase": "ledger", "stage": 0, "mode": "grad",
                     "tau": "nsplit:8:128:64", "ablate": ""})
        for tok in args.tokens.split(","):
            cfgs.append({"phase": "ledger", "stage": 0, "mode": "grad",
                         "tau": "nsplit:8:128:64", "ablate": tok})
        run_trimmed(cfgs)
        return
    # Phase A: nseg2 boundary-variant A/B (the direct candidate win).
    # stage 0 at the production auto spec (nsplit 8 lanes @128 / 8 @64) and
    # at uniform tau=64; stage 3 packed pitch==tau.
    for variant in ("scan", "shift", "col"):
        cfgs.append({"phase": "nseg2", "stage": 0, "mode": "grad",
                     "tau": "nsplit:8:128:64", "nseg2": variant})
    for variant in ("scan", "shift", "col"):
        cfgs.append({"phase": "nseg2", "stage": 0, "mode": "grad",
                     "tau": "64", "nseg2": variant})
    for variant in ("scan", "col"):
        cfgs.append({"phase": "nseg2", "stage": 3, "mode": "grad",
                     "tau": "64", "nseg2": variant})
    if not args.quick:
        # Phase B: the ablation ledger. Baselines first, then one token per
        # run; grad mode covers fwd+bwd kernels (tokens ablate both), fwd
        # mode isolates the forward kernel's share. tau=128 (the compact
        # fast path) is graded in grad mode only -- its fwd share is small
        # and the token set limited.
        for tau, fwd_toks, bwd_toks, modes in (
                ("nsplit:8:128:64", FWD_TOKENS_SPLIT, BWD_TOKENS_SPLIT,
                 ("grad", "fwd")),
                ("128", FWD_TOKENS_128, BWD_TOKENS_128, ("grad",))):
            for mode in modes:
                cfgs.append({"phase": "ledger", "stage": 0, "mode": mode,
                             "tau": tau, "ablate": ""})
                toks = fwd_toks + (bwd_toks if mode == "grad" else [])
                for tok in toks:
                    cfgs.append({"phase": "ledger", "stage": 0, "mode": mode,
                                 "tau": tau, "ablate": tok})

    run_trimmed(cfgs)


def run_trimmed(cfgs):
    print(f"{len(cfgs)} measurements queued")
    consecutive_errors = 0
    for cfg in cfgs:
        rec = run_child(cfg)
        if rec.get("error"):
            consecutive_errors += 1
            if consecutive_errors >= 2:
                print("two consecutive failures (tunnel down?) -- aborting "
                      "chain; rerun to resume (compiles are cached)")
                break
        else:
            consecutive_errors = 0


if __name__ == "__main__":
    main()
