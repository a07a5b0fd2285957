"""Grad-CAM evaluation CLI -- parity with the reference ``test.py``.

Loads a checkpoint, samples random images from a test tree, runs prediction +
Grad-CAM on the predicted class with the default target layer
(layers[-1].blocks[-1] conv-branch 1x1, cf. test.py:101), and saves side-by-side
original/overlay figures.

Usage:
    python -m medmamba_tpu.cli.test --checkpoint_path CKPT --test_dir DIR \
        --num_classes N --medmb_size T [--output_dir out --num_images 10]
"""
from __future__ import annotations

import argparse
import os
import random


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="MedMamba Grad-CAM test (TPU-native).")
    p.add_argument("--checkpoint_path", type=str, required=True,
                   help="framework checkpoint dir, or a reference torch .pth "
                        "file (auto-converted in memory, test.py:76-77 "
                        "parity)")
    p.add_argument("--test_dir", type=str, required=True)
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--medmb_size", type=str, default="T",
                   choices=["T", "S", "B", "Te"])
    p.add_argument("--output_dir", type=str, default="gradcam_outputs")
    p.add_argument("--num_images", type=int, default=10)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--target_layers", type=str, nargs="*", default=None,
                   help="one or more dotted module paths (e.g. "
                        "layers_3.blocks_1.conv1x1); CAMs from multiple "
                        "layers are scaled and averaged "
                        "(grad_cam/utils.py:112-116). Default: the last "
                        "conv1x1 of the conv branch (test.py:101).")
    return p.parse_args(argv)


IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


def main(argv=None):
    args = parse_args(argv)
    from medmamba_tpu.ops.pallas_scan import guard_ablation_unset
    guard_ablation_unset()
    import numpy as np
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from medmamba_tpu.data.transforms import preprocess
    from medmamba_tpu.eval.gradcam import grad_cam, show_cam_on_image
    from medmamba_tpu.models.registry import create_model
    from medmamba_tpu.train.checkpoint import restore_params
    import jax

    os.makedirs(args.output_dir, exist_ok=True)

    model = create_model(args.medmb_size, args.num_classes)
    tree, meta = restore_params(args.checkpoint_path)
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}

    paths = []
    for base, _, files in os.walk(args.test_dir):
        for f in files:
            if f.lower().endswith(IMG_EXTENSIONS):
                paths.append(os.path.join(base, f))
    random.seed(args.seed)
    paths = random.sample(paths, min(args.num_images, len(paths)))
    if not paths:
        raise SystemExit(f"No images found under {args.test_dir}")

    @jax.jit
    def forward(variables, x):
        return jax.nn.softmax(model.apply(variables, x, True), -1)

    for i, path in enumerate(paths):
        img = Image.open(path).convert("RGB").resize(
            (args.image_size, args.image_size), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)[None]
        x = preprocess(jax.random.key(0), jnp.asarray(arr),
                       size=args.image_size, augment=False)
        probs = np.asarray(forward(variables, x))[0]
        pred = int(probs.argmax())
        conf = float(probs[pred])

        tpaths = ([p.split(".") for p in args.target_layers]
                  if args.target_layers else None)
        cam = grad_cam(model, variables, x, target_class=np.array([pred]),
                       target_paths=tpaths)[0]
        overlay = show_cam_on_image(np.asarray(img, np.float32) / 255.0, cam)

        fig, axes = plt.subplots(1, 2, figsize=(9, 4.5))
        axes[0].imshow(img); axes[0].set_title("input"); axes[0].axis("off")
        axes[1].imshow(overlay)
        axes[1].set_title(f"pred {pred} ({conf:.2f})"); axes[1].axis("off")
        out = os.path.join(args.output_dir, f"gradcam_{i}.png")
        fig.tight_layout(); fig.savefig(out, dpi=150); plt.close(fig)
        print(f"{path} -> class {pred} conf {conf:.3f} saved {out}")


if __name__ == "__main__":
    main()
