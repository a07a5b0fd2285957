"""Convert reference torch ``.pth`` checkpoints to framework checkpoints.

The reference publishes trained weights per dataset (README.md:28-45) with the
payload schema of train.py:310-319 ({epoch, model_state_dict, best_acc,
num_classes, class_indices, ...}). This CLI converts such a file (or a bare
state_dict) into an Orbax directory loadable by this framework's evaluate /
test / demo CLIs (restore_params), making the published accuracy numbers
directly verifiable on TPU. ``--reverse`` exports a framework checkpoint back
to a torch ``.pth``.

Usage:
    python -m medmamba_tpu.cli.convert --pth weights.pth --out ckpt_dir
    python -m medmamba_tpu.cli.convert --reverse --checkpoint ckpt_dir --out weights.pth
"""
from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="torch .pth <-> Orbax converter.")
    p.add_argument("--pth", type=str, default=None,
                   help="input torch checkpoint (forward direction)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="input framework checkpoint dir (reverse direction)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--reverse", action="store_true", default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import numpy as np

    if args.reverse:
        import torch
        from medmamba_tpu.train.checkpoint import restore_params
        from medmamba_tpu.utils.torch_interop import flax_to_torch

        tree, meta = restore_params(args.checkpoint)
        sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in flax_to_torch(
                  {"params": tree["params"],
                   "batch_stats": tree.get("batch_stats", {})}).items()}
        payload = {"model_state_dict": sd}
        payload.update({k: meta[k] for k in
                        ("epoch", "best_acc", "num_classes", "class_indices")
                        if k in meta})
        torch.save(payload, args.out)
        print(f"wrote torch checkpoint {args.out} ({len(sd)} tensors)")
        return

    import torch
    import orbax.checkpoint as ocp
    from medmamba_tpu.utils.torch_interop import torch_to_flax

    payload = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = payload.get("model_state_dict", payload) \
        if isinstance(payload, dict) else payload
    variables = torch_to_flax(sd)

    out = os.path.abspath(args.out)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(out, "state"),
                   {"params": variables["params"],
                    "batch_stats": variables["batch_stats"]})
    meta = {
        "epoch": int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0,
        "best_acc": float(payload.get("best_acc", 0.0))
        if isinstance(payload, dict) else 0.0,
        "num_classes": int(
            args.num_classes or (payload.get("num_classes")
                                 if isinstance(payload, dict) else 0) or 0),
        "class_indices": payload.get("class_indices", {})
        if isinstance(payload, dict) else {},
    }
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=4)
    n = len(list(sd))
    print(f"wrote framework checkpoint {out} ({n} torch tensors converted); "
          "params-only: usable by evaluate/test/demo (not --resume).")


if __name__ == "__main__":
    main()
