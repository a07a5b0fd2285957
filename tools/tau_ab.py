"""Tau-exactness A/B: does the factored scan's beyond-budget clip distortion
change a training OUTCOME, or only bit-exactness? (VERDICT r4 next #1)

The production guard (train/tau_select.py) enforces bit-exactness of the
factored scan -- |A*seg_sum(dt)| <= 2*CLIP per segment -- and drops tau the
moment trained magnitudes exceed it, giving away the measured 13-14%
between auto and forced-128 (ROUND4_NOTES session 3). The product bar is
training parity, not bit parity: beyond-budget segments have decay
< e^-160 ~ 0 (fp32 flushes at e^-88), so the clip distorts ratios of
numerically-dead states. This experiment measures the training impact
directly, per the round-4 verdict's protocol:

  * identical init + identical data stream per seed (same --seed -> same
    jax.random key and same loader shuffle), >= 3 seeds, >= 3 epochs on a
    spatially-structured synthetic NPZ task (class-dependent gratings under
    heavy noise -- the labels demand real spatial features, engaging the
    scan dynamics, unlike intensity buckets);
  * arms differing ONLY in scan segmentation / clip:
      auto    tau=auto (the bit-exact production gate)
      f128    tau=128 forced everywhere (violates the trained budgets
              204-231 vs limit 144 -- the config the gate refuses)
      clip20  tau=128 with _CLIP=20 (4x distortion amplification: any
              segment over |A*seg_sum(dt)|=40 distorts; POSITIVE CONTROL
              candidate)
      clip5   tau=128 with _CLIP=5 (16x amplification; the arm that shows
              the methodology can detect corruption when it exists)
  * per-epoch train-loss / val-acc curves + final val acc compared across
    arms per seed, against the across-seed spread within arms.

Each run is one fresh `cli.train` subprocess (MEDMAMBA_SCAN_CLIP is read at
import). Runs are strictly sequential (one TPU process at a time -- the
tunnel stalls otherwise). Results land in docs/experiments/ as JSONL plus a
printed summary table.

Usage:
    python tools/tau_ab.py --seeds 42,43,44 --epochs 4 \
        --arms auto,f128,clip20 --out docs/experiments/tau_ab_r05.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    # NOTE post-finding arm semantics (see ROUND5_NOTES session 2): the
    # round-5 CLI defaults --tau_gate outcome (clip 20); the original A/B
    # arms pin their historical meanings explicitly.
    "auto": {"args": ["--scan_tau", "auto", "--tau_gate", "exact"],
             "env": {"MEDMAMBA_SCAN_CLIP": "80"}},       # r4 bit-exact gate
    "f128": {"args": ["--scan_tau", "128"],
             "env": {"MEDMAMBA_SCAN_CLIP": "80"}},       # NaN'd seed 44
    "clip20": {"args": ["--scan_tau", "128"],
               "env": {"MEDMAMBA_SCAN_CLIP": "20"}},
    "clip5": {"args": ["--scan_tau", "128"],
              "env": {"MEDMAMBA_SCAN_CLIP": "5"}},       # positive control
    # the shipped round-5 default: outcome gate, hardened clip, hysteresis
    "outcome": {"args": ["--scan_tau", "auto", "--tau_gate", "outcome"],
                "env": {}},
    # augmentation A/B (VERDICT r4 #7): exact per-pixel rotate vs the default
    # Pallas rotate kernel (<=~4% of pixels may pick a horizontally adjacent
    # source). Same gate as "outcome" so the only difference is the rotate.
    "rotexact": {"args": ["--scan_tau", "auto", "--tau_gate", "outcome",
                          "--exact_rotate"],
                 "env": {}},
    # ImageFolder-mode rotate-order A/B (VERDICT r4 #7, second deviation):
    # default decodes at image_size (rotate AFTER resize); load_size=28
    # decodes at native resolution (rotate-then-resize, the reference's
    # train.py:90-96 order). Run with --data_dir pointing at a PNG class
    # tree (make_imagefolder below).
    "ifold_default": {"args": ["--scan_tau", "auto", "--tau_gate", "outcome",
                               "--lr", "1e-3"], "env": {}},
    "ifold_native": {"args": ["--scan_tau", "auto", "--tau_gate", "outcome",
                              "--lr", "1e-3", "--load_size", "28"],
                     "env": {}},
}

EPOCH_RE = re.compile(
    r"\[Epoch (\d+)/\d+\] Train Loss: ([\d.]+|nan|inf) \| "
    r"Val Accuracy: ([\d.]+) \| ([\d.]+) img/s")
TAU_RE = re.compile(r"scan tau selection: .* -> (.*)$", re.M)


def make_dataset(root: str, n_train: int, n_val: int, *, classes: int = 9,
                 side: int = 28, noise: float = 0.9, seed: int = 7) -> None:
    """Spatially-structured 9-class task: per-class sinusoid grating
    (frequency 1 + c // 3 cycles, orientation (c % 3) * 60 deg) at low
    contrast under heavy iid noise. Linearly separable ONLY through spatial
    filters, so the model must train real features through the scan."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side] / side
    os.makedirs(root, exist_ok=True)
    for split, n in [("train", n_train), ("val", n_val)]:
        labels = rng.integers(0, classes, size=n)
        freq = 1 + labels // 3
        theta = (labels % 3) * np.pi / 3
        phase = rng.uniform(0, 2 * np.pi, size=n)
        cx = np.cos(theta)[:, None, None]
        cy = np.sin(theta)[:, None, None]
        grating = np.sin(2 * np.pi * freq[:, None, None]
                         * (cx * xx[None] + cy * yy[None])
                         + phase[:, None, None])
        img = 0.5 + 0.2 * grating[..., None] \
            + noise * rng.standard_normal((n, side, side, 3)) * 0.25
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        np.save(os.path.join(root, f"{split}_images.npy"), img)
        np.save(os.path.join(root, f"{split}_labels.npy"),
                labels.astype(np.int64)[:, None])
    print(f"dataset at {root}: {n_train} train / {n_val} val, {classes} classes")


def make_imagefolder(root: str, n_train: int, n_val: int, *,
                     classes: int = 9, side: int = 28, seed: int = 7):
    """Same grating task as make_dataset, saved as PNG class-folder trees
    (train/ and val/ under root) for the ImageFolder/native-loader path."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side] / side
    for split, n in [("train", n_train), ("val", n_val)]:
        labels = rng.integers(0, classes, size=n)
        for c in range(classes):
            os.makedirs(os.path.join(root, split, f"class_{c}"), exist_ok=True)
        freq = 1 + labels // 3
        theta = (labels % 3) * np.pi / 3
        phase = rng.uniform(0, 2 * np.pi, size=n)
        cx = np.cos(theta)[:, None, None]
        cy = np.sin(theta)[:, None, None]
        grating = np.sin(2 * np.pi * freq[:, None, None]
                         * (cx * xx[None] + cy * yy[None])
                         + phase[:, None, None])
        img = 0.5 + 0.2 * grating[..., None]             + 0.9 * rng.standard_normal((n, side, side, 3)) * 0.25
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        for i in range(n):
            Image.fromarray(img[i]).save(os.path.join(
                root, split, f"class_{labels[i]}", f"{i:05d}.png"))
    print(f"imagefolder at {root}: {n_train} train / {n_val} val")


def run_one(arm: str, seed: int, epochs: int, data_dir: str, work: str,
            batch_size: int, log_dir: str):
    cfg = ARMS[arm]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
    env.update(cfg["env"])
    save = os.path.join(work, f"{arm}_s{seed}")
    # ImageFolder trees carry train/ and val/ subdirs; NPZ dirs hold both
    # splits as {split}_*.npy in one directory
    tdir, vdir = data_dir, data_dir
    if os.path.isdir(os.path.join(data_dir, "train")):
        tdir = os.path.join(data_dir, "train")
        vdir = os.path.join(data_dir, "val")
    cmd = [sys.executable, "-m", "medmamba_tpu.cli.train",
           "--train_dir", tdir, "--val_dir", vdir,
           "--epochs", str(epochs), "--batch_size", str(batch_size),
           "--seed", str(seed), "--augmentation", "--log_every", "0",
           "--save_dir", save] + cfg["args"]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=7200)
    dt = time.time() - t0
    logp = os.path.join(log_dir, f"{arm}_s{seed}.log")
    with open(logp, "w") as f:
        f.write(r.stdout + "\n=== STDERR ===\n" + r.stderr)
    if r.returncode != 0:
        print(f"  !! {arm} s{seed} FAILED rc={r.returncode} (log: {logp})")
        return []
    text = r.stdout + r.stderr
    recs, seen = [], set()
    for m in EPOCH_RE.finditer(text):
        ep = int(m.group(1))
        if ep in seen:  # epoch line appears on stdout AND the log stream
            continue
        seen.add(ep)
        recs.append({"arm": arm, "seed": seed, "epoch": ep,
                     "loss": float(m.group(2)), "val_acc": float(m.group(3)),
                     "img_s": float(m.group(4))})
    taus = TAU_RE.findall(text)
    if taus:
        recs.append({"arm": arm, "seed": seed, "tau_trace": taus})
    print(f"  {arm} s{seed}: "
          + " ".join(f"e{r['epoch']}={r['val_acc']:.3f}" for r in recs
                     if "epoch" in r)
          + f"  ({dt:.0f}s)")
    return recs


def summarize(records):
    by = {}
    for r in records:
        if "epoch" not in r:
            continue
        by.setdefault(r["arm"], {}).setdefault(r["seed"], {})[r["epoch"]] = r
    arms = list(by)
    if not arms:
        return
    print("\n=== final val acc (last epoch) ===")
    finals = {}
    for arm in arms:
        vals = []
        for seed, eps in sorted(by[arm].items()):
            last = eps[max(eps)]
            vals.append(last["val_acc"])
        finals[arm] = np.array(vals)
        print(f"  {arm:7s} {[f'{v:.4f}' for v in vals]} "
              f"mean {np.mean(vals):.4f} spread {np.ptp(vals):.4f}")
    if "auto" in finals:
        base = by["auto"]
        print("\n=== per-seed delta vs auto (same init/data) ===")
        for arm in arms:
            if arm == "auto":
                continue
            ds = []
            for seed in sorted(by[arm]):
                if seed in base:
                    a = base[seed][max(base[seed])]["val_acc"]
                    b = by[arm][seed][max(by[arm][seed])]["val_acc"]
                    ds.append(b - a)
            if ds:
                print(f"  {arm:7s} deltas {[f'{d:+.4f}' for d in ds]} "
                      f"mean {np.mean(ds):+.4f}")
        noise = np.ptp(finals["auto"]) if len(finals["auto"]) > 1 else None
        if noise is not None:
            print(f"\n  seed-noise reference (auto across-seed spread): {noise:.4f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", default="42,43,44")
    p.add_argument("--arms", default="auto,f128,clip20")
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_train", type=int, default=19200)
    p.add_argument("--n_val", type=int, default=2048)
    p.add_argument("--data_dir", default="/tmp/tau_ab/data")
    p.add_argument("--work", default="/tmp/tau_ab")
    p.add_argument("--out", default="docs/experiments/tau_ab_r05.jsonl")
    p.add_argument("--imagefolder", action="store_true",
                   help="generate/use a PNG class-folder tree (the ifold_* "
                        "arms) instead of NPZ")
    p.add_argument("--resume", action="store_true",
                   help="append to --out and skip (arm, seed) pairs already "
                        "recorded there")
    args = p.parse_args(argv)

    seeds = [int(s) for s in args.seeds.split(",")]
    arms = args.arms.split(",")
    for a in arms:
        assert a in ARMS, a

    os.makedirs(args.work, exist_ok=True)
    log_dir = os.path.join(args.work, "logs")
    os.makedirs(log_dir, exist_ok=True)
    if args.imagefolder:
        if not os.path.isdir(os.path.join(args.data_dir, "train")):
            make_imagefolder(args.data_dir, args.n_train, args.n_val)
    elif not os.path.exists(os.path.join(args.data_dir, "train_images.npy")):
        make_dataset(args.data_dir, args.n_train, args.n_val)

    outp = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(outp), exist_ok=True)
    records = []
    done = set()
    if args.resume and os.path.exists(outp):
        with open(outp) as f:
            for line in f:
                r = json.loads(line)
                records.append(r)
                done.add((r["arm"], r["seed"])) if "epoch" in r else None

    mode = "a" if args.resume else "w"
    with open(outp, mode) as f:
        # seed-major order: every arm sees seed 42 first, so all fresh
        # compiles (new clip values) happen early and get diagnosed early
        for seed in seeds:
            for arm in arms:
                if (arm, seed) in done:
                    print(f"  {arm} s{seed}: already recorded, skipping")
                    continue
                for r in run_one(arm, seed, args.epochs, args.data_dir,
                                 args.work, args.batch_size, log_dir):
                    records.append(r)
                    f.write(json.dumps(r) + "\n")
                f.flush()
    summarize(records)


if __name__ == "__main__":
    main()
