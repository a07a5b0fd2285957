"""Grad-CAM demos on the bundled CAM backbones (ViT / Swin / MobileNetV2).

Parity with ``grad_cam/main_cnn.py`` (MobileNet-family CAM), ``main_vit.py``
(target blocks[-1].norm1, cls-token reshape) and ``main_swin.py`` (target
model.norm). The reference scripts load torchvision/.pth weights; here weights
come from an Orbax checkpoint (--checkpoint_path) or random init (--random-ok,
for smoke-testing the attribution plumbing).

Usage:
    python -m medmamba_tpu.cli.cam_backbones --arch vit --image img.png \
        [--checkpoint_path CKPT | --random-ok] [--target_category 281]
"""
from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", choices=["vit", "swin", "mobilenet"],
                   required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--random-ok", action="store_true",
                   help="allow randomly-initialized weights (smoke test)")
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--target_category", type=int, default=None)
    p.add_argument("--output", default="cam_backbone.png")
    p.add_argument("--image_size", type=int, default=224)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from medmamba_tpu.data.transforms import preprocess
    from medmamba_tpu.eval.gradcam import grad_cam, show_cam_on_image

    reshape_transform = None
    if args.arch == "vit":
        from medmamba_tpu.models.vit import (vit_base_patch16_224,
                                             vit_reshape_transform)
        import functools
        model = vit_base_patch16_224(num_classes=args.num_classes)
        target_path = (f"blocks_{model.depth - 1}", "norm1")
        reshape_transform = functools.partial(
            vit_reshape_transform, grid=args.image_size // 16)
    elif args.arch == "swin":
        from medmamba_tpu.models.swin import swin_tiny_patch4_window7_224
        model = swin_tiny_patch4_window7_224(num_classes=args.num_classes)
        target_path = ("norm",)
    else:
        from medmamba_tpu.models.mobilenet import MobileNetV2
        model = MobileNetV2(num_classes=args.num_classes)
        target_path = ("head_conv", "conv")

    if args.checkpoint_path:
        from medmamba_tpu.train.checkpoint import restore_params
        tree, _ = restore_params(args.checkpoint_path)
        variables = {"params": tree["params"]}
        if tree.get("batch_stats"):
            variables["batch_stats"] = tree["batch_stats"]
    elif args.random_ok:
        variables = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, args.image_size, args.image_size, 3)), True)
    else:
        raise SystemExit("need --checkpoint_path or --random-ok")

    img = Image.open(args.image).convert("RGB").resize(
        (args.image_size, args.image_size), Image.BILINEAR)
    arr = np.asarray(img, np.uint8)[None]
    x = preprocess(jax.random.key(0), jnp.asarray(arr),
                   size=args.image_size, augment=False)

    logits = jax.jit(lambda v, im: model.apply(v, im, True))(variables, x)
    pred = int(np.asarray(logits).argmax())
    target = args.target_category if args.target_category is not None else pred

    cam = grad_cam(model, variables, x, target_class=np.array([target]),
                   target_path=target_path,
                   reshape_transform=reshape_transform)[0]
    overlay = show_cam_on_image(np.asarray(img, np.float32) / 255.0, cam)
    fig, axes = plt.subplots(1, 2, figsize=(9, 4.5))
    axes[0].imshow(img); axes[0].axis("off")
    axes[1].imshow(overlay); axes[1].axis("off")
    axes[1].set_title(f"{args.arch} CAM target={target} (pred={pred})")
    fig.tight_layout(); fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
