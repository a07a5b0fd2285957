"""Export a trained checkpoint as a serialized StableHLO serving artifact.

Usage:
    python -m medmamba_tpu.cli.export --checkpoint_path CKPT --out model.shlo \
        [--medmb_size T] [--num_classes N] [--image_size 224] \
        [--batch poly|N] [--platforms cpu,tpu] [--scan_impl assoc|pallas] \
        [--no_preprocess]

The artifact bakes in the weights and (by default) the preprocessing: a
serving runtime feeds raw uint8 (B, H, W, 3) frames and gets class
probabilities back, with no model code or checkpoint needed
(utils/export.py). `--batch poly` (default) exports a symbolic batch dim.
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export a serving artifact.")
    p.add_argument("--checkpoint_path", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--medmb_size", type=str, default="T",
                   choices=["T", "S", "B", "Te"])
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--input_size", type=int, default=None,
                   help="spatial size of the raw frames the artifact "
                        "accepts (StableHLO pins it; the baked-in "
                        "preprocess resizes to --image_size). Default: "
                        "image_size, i.e. callers pre-resize.")
    p.add_argument("--batch", type=str, default="poly",
                   help="'poly' (symbolic batch dim) or a fixed int")
    p.add_argument("--platforms", type=str, default="cpu,tpu")
    p.add_argument("--scan_impl", type=str, default="assoc",
                   choices=["assoc", "pallas"],
                   help="assoc = portable XLA artifact (default); pallas = "
                        "TPU-only artifact with the Mosaic kernel baked in")
    p.add_argument("--no_preprocess", action="store_true", default=False,
                   help="artifact consumes preprocessed float32 instead of "
                        "raw uint8")
    p.add_argument("--scan_tau", type=str, default="16",
                   choices=["16", "32", "64", "128"],
                   help="scan segment length baked into a --scan_impl pallas "
                        "artifact (clamped per stage by the packing cap; "
                        "trained checkpoints typically serve at 128 for "
                        "~2x scan speed vs the 16 floor -- the kernel clip "
                        "is hardened to 20 for tau > 16, the "
                        "outcome-validated regime). No effect on assoc "
                        "artifacts.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import os
    if args.scan_tau != "16":
        # beyond-budget segments at clip 80 are an fp32 overflow hazard
        # (ROUND5_NOTES session 2); harden before the kernel import
        os.environ.setdefault("MEDMAMBA_SCAN_CLIP", "20")
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset
    guard_ablation_unset()
    platforms = tuple(s.strip() for s in args.platforms.split(","))
    if args.scan_impl == "pallas" and platforms != ("tpu",):
        raise SystemExit("--scan_impl pallas bakes a TPU-only Mosaic kernel "
                         "into the artifact: it requires --platforms tpu "
                         f"(got {args.platforms!r})")

    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.train.checkpoint import restore_params
    from medmamba_tpu.utils.export import export_forward

    tree, meta = restore_params(args.checkpoint_path)
    num_classes = args.num_classes or meta.get("num_classes")
    if not num_classes:
        raise SystemExit("--num_classes required (not in checkpoint meta)")
    model = create_model(args.medmb_size, num_classes,
                         scan_tau=int(args.scan_tau)
                         if args.scan_impl == "pallas" else None)
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}
    blob = export_forward(
        model, variables, image_size=args.image_size,
        batch=None if args.batch == "poly" else int(args.batch),
        input_size=args.input_size, platforms=platforms,
        with_preprocess=not args.no_preprocess, scan_impl=args.scan_impl)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB serving artifact to {args.out} "
          f"(batch={'symbolic' if args.batch == 'poly' else args.batch}, "
          f"platforms={args.platforms}, scan_impl={args.scan_impl})")


if __name__ == "__main__":
    main()
