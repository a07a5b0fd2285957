"""Training CLI -- full surface parity with the reference ``train.py``.

Flags, NPZ-vs-ImageFolder autodetection, mode-dependent hyperparameter defaults
(train.py:68-86), augmentation, early stopping, best/last checkpoint lifecycle and
``class_indices.json`` all behave as in the reference; the engine underneath is the
jitted JAX/TPU trainer with data-parallel sharding over a device mesh.

Usage:
    python -m medmamba_tpu.cli.train --train_dir D --val_dir D [options]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s - %(levelname)s - %(message)s")
log = logging.getLogger("medmamba_tpu.train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a Medmamba model (TPU-native).")
    p.add_argument("--medmb_size", type=str, default="T",
                   choices=["T", "S", "B", "Te"])
    p.add_argument("--train_dir", type=str, required=True)
    p.add_argument("--val_dir", type=str, required=True)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--model_name", type=str, default="Medmamba")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--patience", type=int, default=25)
    p.add_argument("--save_dir", type=str, default=".")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--augmentation", action="store_true", default=False)
    p.add_argument("--use_early_stopping", action="store_true", default=False)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    # TPU-native extensions (defaults preserve reference behavior)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--load_size", type=int, default=None,
                   help="ImageFolder decode resolution (default: image_size). "
                        "Set to the source resolution to run flip/rotate at "
                        "native size, the reference's transform order "
                        "(train.py:90-96). MEASURED (round-5 A/B, 2 seeds, "
                        "identical init/data, ROUND5_NOTES): final-acc "
                        "deltas +0.022/-0.012 vs the default order -- "
                        "within seed noise -- and decoding small sources "
                        "at native size was ~4.6x faster host-side.")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scan_impl", type=str, default="auto",
                   choices=["auto", "pallas", "assoc", "seq"])
    p.add_argument("--scan_tau", type=str, default="auto",
                   choices=["auto", "16", "32", "64", "128"],
                   help="Scan kernel segment length. Larger is faster "
                        "(tau=chunk removes the segment-boundary machinery "
                        "entirely). 'auto' (default) measures the trained "
                        "|A*seg_sum(dt)| magnitudes on a calibration batch "
                        "every epoch and picks the largest tau per stage "
                        "inside the --tau_gate budget, falling back to 16 "
                        "when it is exceeded. A number forces that tau "
                        "everywhere (clamped to the short-L packing cap; "
                        "see docs/DESIGN.md).")
    p.add_argument("--tau_gate", type=str, default="outcome",
                   choices=["outcome", "exact"],
                   help="Budget gate for --scan_tau auto. 'outcome' "
                        "(default) bounds segments by measured "
                        "training-outcome safety and hardens the kernel "
                        "clip to 20 (overflow-impossible; A/B-validated "
                        "across seeds, ROUND5_NOTES) -- the fast regime. "
                        "'exact' keeps the round-4 bit-exactness bound "
                        "(clip 80) for bit-level reproducibility studies; "
                        "~13%% slower at trained magnitudes.")
    p.add_argument("--fast_decode", action="store_true", default=False,
                   help="DCT-scaled JPEG decode in the native loader "
                        "(decode at the smallest libjpeg N/8 scale covering "
                        "the target size, then the PIL-parity resize): "
                        "~1.8x host decode throughput on photo-like JPEGs, "
                        "pixel values deviate slightly (p99 <= 1 LSB "
                        "measured; PNG unaffected). Default: bit-exact "
                        "full decode.")
    p.add_argument("--exact_rotate", action="store_true", default=False,
                   help="Rotation augmentation via the exact per-pixel gather "
                        "instead of the fast Pallas kernel. The kernel lets "
                        "<=~4%% of pixels pick a horizontally adjacent source "
                        "pixel; MEASURED accuracy impact: none (round-5 A/B, "
                        "2 seeds, identical init/data: exact-rotate final "
                        "accs -0.016/-0.015 vs the kernel -- within seed "
                        "noise; ROUND5_NOTES). Eval is never affected. The "
                        "kernel is ~10x faster and compiles in seconds "
                        "(ops/rotate_pallas.py).")
    p.add_argument("--use_checkpoint", action="store_true", default=False,
                   help="Activation rematerialization per block (jax.checkpoint).")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="If set, capture a jax.profiler trace of a few steps.")
    p.add_argument("--log_every", type=int, default=1,
                   help="Per-step progress line frequency (0 disables; the "
                        "reference shows live loss via tqdm, train.py:275-288).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # The kernel clip is read ONCE at pallas_scan import: set it before any
    # framework import. Outcome-gated auto AND forced taus may run segments
    # beyond the bit-exact budget, where the default clip 80 is an fp32
    # overflow hazard (measured NaN, ROUND5_NOTES session 2); the hardened
    # clip 20 is overflow-impossible and outcome-equivalent (A/B). An
    # explicit MEDMAMBA_SCAN_CLIP in the environment wins.
    if args.tau_gate == "outcome" or args.scan_tau not in ("auto",):
        os.environ.setdefault("MEDMAMBA_SCAN_CLIP", "20")
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset
    guard_ablation_unset()

    import jax
    import jax.numpy as jnp

    from medmamba_tpu.data.datasets import open_dataset, is_npz_dir
    from medmamba_tpu.data.loader import BatchLoader
    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.parallel.mesh import make_mesh, shard_batch, replicate_state
    from medmamba_tpu.train import checkpoint as ckpt
    from medmamba_tpu.train.trainer import (
        eval_step, init_state, make_optimizer, train_step)

    os.makedirs(args.save_dir, exist_ok=True)
    log.info("Using %s device(s): %s", len(jax.devices()), jax.devices())

    npz_mode = is_npz_dir(args.train_dir, "train")
    if npz_mode:
        log.info("Detected MedMNIST (NPZ) dataset.")
        epochs = args.epochs or 100
        batch_size = args.batch_size or 100
        lr = args.lr or 1e-3
        lr_decay_epochs = [50, 75]
    else:
        log.info("Detected non-MedMNIST dataset (ImageFolder).")
        epochs = args.epochs or 150
        batch_size = args.batch_size or 64
        lr = args.lr or 1e-4
        lr_decay_epochs = []

    load_size = args.load_size or args.image_size
    train_ds, _ = open_dataset(args.train_dir, "train", load_size=load_size)
    val_ds, _ = open_dataset(args.val_dir, "val", load_size=load_size)
    num_classes = train_ds.get_num_classes()
    class_indices = train_ds.get_class_to_idx()
    if not npz_mode:
        class_indices = {v: k for k, v in train_ds.get_class_to_idx().items()}
    if args.num_classes is not None:
        if npz_mode and args.num_classes != num_classes:
            log.warning("--num_classes (%d) overrides inferred classes (%d).",
                        args.num_classes, num_classes)
        num_classes = args.num_classes

    ckpt.save_class_indices(args.save_dir, class_indices)

    # Multi-host pods: every process runs this CLI; the loaders yield only
    # this process's slice of each (seed-identical) global batch and
    # shard_batch reassembles the global array across hosts. process_count
    # is 1 on single-controller setups -- identical behavior to before.
    pi, pc = jax.process_index(), jax.process_count()
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True,
                               seed=args.seed, process_index=pi,
                               process_count=pc)
    val_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                             seed=args.seed, process_index=pi,
                             process_count=pc)
    steps_per_epoch = len(train_loader)
    log.info("Using %d train / %d val images, %d classes. Epochs %d, batch %d, lr %g",
             len(train_ds), len(val_ds), num_classes, epochs, batch_size, lr)

    if args.exact_rotate:
        os.environ["MEDMAMBA_EXACT_ROTATE"] = "1"
    if args.fast_decode:
        os.environ["MEDMAMBA_FAST_DECODE"] = "1"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # tau policy: 'auto' calibrates per stage against measured magnitudes
    # (below, and again every epoch); an explicit number forces it everywhere.
    tau_auto = False
    scan_tau = None
    if args.scan_tau == "auto":
        tau_auto = (jax.default_backend() == "tpu"
                    and args.scan_impl in ("auto", "pallas"))
    else:
        scan_tau = int(args.scan_tau)
        os.environ["MEDMAMBA_SCAN_TAU"] = args.scan_tau  # kernel-level paths
    model = create_model(args.medmb_size, num_classes,
                         attn_drop_rate=args.attn_drop_rate, dtype=dtype,
                         scan_impl=args.scan_impl,
                         use_checkpoint=args.use_checkpoint,
                         scan_tau=scan_tau)
    log.info('Model size: "%s"', args.medmb_size)

    tx = make_optimizer(lr, npz_mode, lr_decay_epochs, steps_per_epoch)
    rng = jax.random.key(args.seed)
    state = init_state(model, rng, tx,
                       input_shape=(1, args.image_size, args.image_size, 3))

    mesh = make_mesh()
    state = replicate_state(state, mesh)

    start_epoch, best_acc, best_path = 1, 0.0, None
    if args.resume:
        if os.path.isdir(args.resume):
            state, meta = ckpt.restore_checkpoint(args.resume, state)
            state = replicate_state(state, mesh)
            start_epoch = int(meta.get("epoch", 0)) + 1
            best_acc = float(meta.get("best_acc", 0.0))
            log.info("Resumed from %s at epoch %d (best_acc %.3f)",
                     args.resume, start_epoch, best_acc)
        else:
            log.error("Checkpoint not found: %s. Starting from scratch.", args.resume)

    if epochs < start_epoch:
        log.warning("Target epochs (%d) < start epoch (%d); nothing to do.",
                    epochs, start_epoch)
        print(f"Finished Training (Target Epoch <= Start Epoch). "
              f"Best validation accuracy recorded: {best_acc:.3f}")
        return

    cur_taus = None
    if tau_auto:
        from medmamba_tpu.data.transforms import preprocess
        from medmamba_tpu.train.tau_select import TauHysteresis, select_scan_tau

        calib_pre = jax.jit(lambda im: preprocess(
            jax.random.key(0), im, size=args.image_size, augment=False))
        # Debounce spec changes (VERDICT r4 #5): a retrace costs ~40 s even
        # cache-warm, so one epoch of budget jitter around a threshold must
        # not thrash. Under the outcome gate a one-epoch transient may run
        # on the old spec (the limit already carries the measured outcome
        # margin); the exact gate keeps drops immediate.
        hysteresis = TauHysteresis(
            drop_after=2 if args.tau_gate == "outcome" else 1, raise_after=2)

        def recalibrate(state, model, images_dev, cur):
            """Measure |A|*seg_sum(dt) on a batch; swap the per-stage taus in
            via a model clone when the (debounced) selection changes
            (apply_fn is a static jit field, so the train/eval steps
            retrace -- cached compiles make revisiting a previous selection
            cheap)."""
            taus = select_scan_tau(model, state.params, state.batch_stats,
                                   calib_pre(images_dev),
                                   image_size=args.image_size,
                                   gate=args.tau_gate)
            taus, changed = hysteresis.propose(taus)
            if not changed:
                return state, model, cur
            log.info("scan tau selection: %s -> %s", cur, taus)
            model = model.clone(scan_tau=taus)
            return state.replace(apply_fn=model.apply), model, taus

        images0, labels0 = next(iter(train_loader.epoch(0)))
        images0, _ = shard_batch(mesh, images0, labels0)
        state, model, cur_taus = recalibrate(state, model, images0, cur_taus)

    data_rng = jax.random.key(args.seed + 1)
    epochs_without_improvement = 0
    final_epoch = start_epoch - 1

    from collections import deque

    from medmamba_tpu.data.loader import device_prefetch

    for epoch in range(start_epoch, epochs + 1):
        final_epoch = epoch
        t0 = time.time()
        running_loss, nsteps = 0.0, 0
        pending = deque()  # device losses; fetched 2 steps late so the host
        # stays ahead of the device (dispatch + H2D overlap compute)
        for images, labels in device_prefetch(
                train_loader.epoch(epoch),
                lambda im, lb: shard_batch(mesh, im, lb)):
            if (args.profile_dir and epoch == start_epoch and nsteps == 2):
                jax.profiler.start_trace(args.profile_dir)
            state, loss = train_step(state, images, labels, data_rng,
                                     augment=args.augmentation,
                                     image_size=args.image_size)
            pending.append(loss)
            nsteps += 1
            if len(pending) > 2:
                lval = float(pending.popleft())
                running_loss += lval
                if args.log_every and nsteps % args.log_every == 0:
                    print(f"\rtrain epoch[{epoch}/{epochs}] "
                          f"step {nsteps}/{steps_per_epoch} "
                          f"loss:{lval:.3f}", end="", flush=True)
            if (args.profile_dir and epoch == start_epoch and nsteps == 5):
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", args.profile_dir)
        while pending:
            running_loss += float(pending.popleft())
        if args.log_every:
            print()
        train_time = time.time() - t0

        if tau_auto and nsteps:
            # re-check the clip budgets against the *trained* magnitudes on
            # the epoch's last batch; drops tau the moment a margin is
            # exceeded, raises it when training has settled into range
            state, model, cur_taus = recalibrate(state, model, images,
                                                 cur_taus)

        correct_dev = None  # accumulate on device; one host sync per epoch
        for images, labels in device_prefetch(
                val_loader.epoch(0),
                lambda im, lb: shard_batch(mesh, im, lb)):
            c, _ = eval_step(state, images, labels, image_size=args.image_size)
            correct_dev = c if correct_dev is None else correct_dev + c
        correct = int(correct_dev) if correct_dev is not None else 0
        val_acc = correct / len(val_ds)
        avg_loss = running_loss / max(nsteps, 1)
        ips = nsteps * batch_size / train_time if train_time > 0 else 0.0
        msg = (f"[Epoch {epoch}/{epochs}] Train Loss: {avg_loss:.3f} | "
               f"Val Accuracy: {val_acc:.3f} | {ips:.1f} img/s")
        log.info(msg)
        print(msg)

        if val_acc > best_acc:
            best_acc = val_acc
            epochs_without_improvement = 0
            new_best = os.path.join(
                args.save_dir, f"{args.model_name}_epoch_{epoch}_best")
            ckpt.save_checkpoint(new_best, state, epoch=epoch, best_acc=best_acc,
                                 num_classes=num_classes,
                                 class_indices=class_indices)
            log.info("New best checkpoint saved to %s (acc %.3f)", new_best, best_acc)
            if best_path and best_path != new_best:
                # defer: the old best stays on disk until the new save commits
                ckpt.delete_checkpoint_after_commit(best_path)
            best_path = new_best
        else:
            epochs_without_improvement += 1
            log.info("No improvement. Patience %d/%d",
                     epochs_without_improvement, args.patience)

        if args.use_early_stopping and epochs_without_improvement >= args.patience:
            log.info("Early stopping triggered after %d epochs without improvement "
                     "at epoch %d/%d.", args.patience, epoch, epochs)
            break

    last_path = os.path.join(args.save_dir,
                             f"{args.model_name}_epoch_{final_epoch}_last")
    ckpt.save_checkpoint(last_path, state, epoch=final_epoch, best_acc=best_acc,
                         num_classes=num_classes, class_indices=class_indices)
    ckpt.wait_for_saves()
    log.info("Saved last checkpoint to %s", last_path)
    print(f"Finished Training. Final Epoch Reached: {final_epoch}. "
          f"Best validation accuracy: {best_acc:.3f}")


if __name__ == "__main__":
    main()
