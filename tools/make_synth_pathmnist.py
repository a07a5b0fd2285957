"""Generate a synthetic PathMNIST-shaped NPZ dataset for the full-recipe
rehearsal (VERDICT round-2 item #8): 89,996 train / 10,004 val images of
28x28x3 uint8, 9 classes, in the MedMNIST {split}_images.npy/_labels.npy
layout the reference's datasets.py:13-17 reads.

Class signal = per-class brightness level + channel tint + a class-dependent
blob position, with heavy noise -- learnable but not trivially separable, so
loss/accuracy curves exercise the real optimization path.

Usage: python tools/make_synth_pathmnist.py [out_dir]
"""
import os
import sys

import numpy as np


def make_split(rng, n, num_classes=9, size=28):
    labels = rng.integers(0, num_classes, (n,), dtype=np.int64)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = np.empty((n, size, size, 3), np.uint8)
    chunk = 4096
    for i0 in range(0, n, chunk):
        lab = labels[i0:i0 + chunk]
        m = len(lab)
        base = 90.0 + 12.0 * lab[:, None, None, None]
        tint = np.stack([(lab % 3 == 0), (lab % 3 == 1), (lab % 3 == 2)],
                        axis=-1).astype(np.float32) * 35.0
        cy = 6.0 + 2.0 * (lab % 4)
        cx = 6.0 + 2.0 * (lab // 4)
        blob = 60.0 * np.exp(-(((yy[None] - cy[:, None, None]) ** 2
                                + (xx[None] - cx[:, None, None]) ** 2)
                               / 18.0))
        noise = rng.normal(0.0, 28.0, (m, size, size, 3)).astype(np.float32)
        px = base + tint[:, None, None, :] + blob[..., None] + noise
        imgs[i0:i0 + chunk] = np.clip(px, 0, 255).astype(np.uint8)
    return imgs, labels


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pathmnist_synth"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    for split, n in (("train", 89996), ("val", 10004)):
        imgs, labels = make_split(rng, n)
        np.save(os.path.join(out, f"{split}_images.npy"), imgs)
        np.save(os.path.join(out, f"{split}_labels.npy"), labels)
        print(split, imgs.shape, labels.shape, "classes:",
              np.bincount(labels, minlength=9))


if __name__ == "__main__":
    main()
