"""Confusion-matrix / metrics evaluation CLI.

The reference's ConfusionMatrix driver is hardwired to MobileNetV2 + a flower
dataset (ConfusionMatrix/main.py:100-104); its README metrics (README.md:28-45)
imply running the same computation on MedMamba plus F1 and AUC. This CLI does
exactly that: load a checkpoint, evaluate a val/test set, print overall accuracy +
per-class precision/sensitivity/specificity/F1 + macro AUC, save the heatmap.

Usage:
    python -m medmamba_tpu.cli.evaluate --checkpoint_path CKPT --data_dir DIR \
        [--split test --medmb_size T --batch_size 64 --plot cm.png]
"""
from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MedMamba metric evaluation.")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   help="framework checkpoint dir, or a reference torch .pth "
                        "file (auto-converted in memory, test.py:76-77 "
                        "parity)")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--medmb_size", type=str, default="T",
                   choices=["T", "S", "B", "Te"])
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--plot", type=str, default=None)
    p.add_argument("--scan_tau", type=str, default="auto",
                   choices=["auto", "16", "32", "64", "128"],
                   help="Scan kernel segment length for the eval forwards "
                        "(same dial as the train CLI). 'auto' calibrates on "
                        "the first batch in eval mode on TPU; a number "
                        "forces it.")
    p.add_argument("--tau_gate", type=str, default="outcome",
                   choices=["outcome", "exact"],
                   help="Budget gate for --scan_tau auto (round 5): "
                        "'outcome' selects tau by measured outcome safety "
                        "with the overflow-hardened clip 20 (fast); "
                        "'exact' keeps the bit-exact bound (clip 80).")
    p.add_argument("--imagenet_preproc", action="store_true", default=False,
                   help="Resize(256)+CenterCrop(224)+ImageNet mean/std, the "
                        "recipe of the reference ConfusionMatrix driver "
                        "(ConfusionMatrix/main.py:84-87); default is the "
                        "training recipe (resize + 0.5/0.5 normalize).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # kernel clip is read once at import: harden it for outcome-gated or
    # forced taus (fp32 overflow hazard on beyond-budget segments at clip
    # 80 -- ROUND5_NOTES session 2); explicit MEDMAMBA_SCAN_CLIP env wins
    if args.tau_gate == "outcome" or getattr(args, "scan_tau", "auto") != "auto":
        os.environ.setdefault("MEDMAMBA_SCAN_CLIP", "20")
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset
    guard_ablation_unset()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from medmamba_tpu.data.datasets import open_dataset
    from medmamba_tpu.data.loader import BatchLoader
    from medmamba_tpu.data.transforms import preprocess
    from medmamba_tpu.eval.metrics import ConfusionMatrix
    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.train.checkpoint import restore_params

    ds, _ = open_dataset(args.data_dir, args.split, load_size=args.image_size)
    tree, meta = restore_params(args.checkpoint_path)
    num_classes = (args.num_classes or meta.get("num_classes")
                   or ds.get_num_classes())
    class_indices = meta.get("class_indices") or ds.get_class_to_idx()
    labels = [str(k) for k in class_indices]

    model = create_model(args.medmb_size, num_classes)
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}

    imagenet_mean = jnp.asarray([0.485, 0.456, 0.406])
    imagenet_std = jnp.asarray([0.229, 0.224, 0.225])

    def prep(images):
        if args.imagenet_preproc:
            # Resize(256) + CenterCrop(224) + ImageNet normalize
            b, h, w, c = images.shape
            x = jax.image.resize(images.astype(jnp.float32),
                                 (b, 256, 256, c), method="bilinear")
            off = (256 - args.image_size) // 2
            x = x[:, off:off + args.image_size, off:off + args.image_size, :]
            x = (x / 255.0 - imagenet_mean) / imagenet_std
        else:
            x = preprocess(jax.random.key(0), images, size=args.image_size,
                           augment=False)
        return x

    if args.scan_tau != "auto":
        model = model.clone(scan_tau=int(args.scan_tau))
    need_calib = (args.scan_tau == "auto"
                  and jax.default_backend() == "tpu")

    def make_forward(m):
        @jax.jit
        def forward(images):
            return jax.nn.softmax(m.apply(variables, prep(images), True), -1)
        return forward

    forward = None
    cm = ConfusionMatrix(num_classes, labels=labels)
    loader = BatchLoader(ds, args.batch_size, shuffle=False)
    for images, trues in loader.epoch(0):
        imgs = jnp.asarray(images)
        if forward is None:
            if need_calib:
                # Serving-side scan-tau selection on the first (already
                # decoded) batch: trained checkpoints usually admit large
                # tau (tau=chunk halves the scan's forward cost vs the
                # tau=16 floor). Calibrate in EVAL mode (running-average
                # BatchNorm -- the distribution these forwards run in);
                # margin 0.8 since one batch samples the stream.
                from medmamba_tpu.train.tau_select import select_scan_tau

                x0 = jax.jit(prep)(imgs)
                taus = select_scan_tau(model, variables["params"],
                                       variables["batch_stats"], x0,
                                       image_size=args.image_size,
                                       margin=0.8, train_mode=False,
                                   gate=args.tau_gate)
                model = model.clone(scan_tau=taus)
                print(f"scan tau (serving auto-selection): {taus}")
            forward = make_forward(model)
        probs = np.asarray(forward(imgs))
        # The loader pads the final partial batch with label -1 (single static
        # shape -> one XLA compile); padded rows must not enter the metrics.
        valid = trues >= 0
        cm.update(probs.argmax(1)[valid], trues[valid], probs[valid])

    print(cm.summary())
    if args.plot:
        cm.plot(args.plot)
        print(f"confusion-matrix heatmap saved to {args.plot}")


if __name__ == "__main__":
    main()
