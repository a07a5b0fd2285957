"""On-device, batched image preprocessing (TPU-native replacement for the
torchvision per-item transform pipelines selected at train.py:87-114).

Reference train pipeline (augmentation on): RandomHorizontalFlip -> RandomRotation(10)
-> Resize(224,224) -> ToTensor -> Normalize(mean=std=0.5). Eval: Resize -> ToTensor
-> Normalize. Here the same ops run as one fused jitted function over the whole
uint8 batch on device: flip/rotate at the batch's resolution, bilinear resize,
then ``x/127.5 - 1`` normalization. RandomRotation uses nearest resampling with
zero fill, matching the torchvision default interpolation.

Resolution note: in NPZ mode batches arrive at native resolution (e.g. 28x28
MedMNIST), so flip/rotate run at native resolution exactly like the reference.
In ImageFolder mode images are decoded at ``load_size`` (default = the target
size) for static batch shapes, so rotation happens post-decode-resize -- a
deliberate deviation from the reference's rotate-at-native-then-resize order
(train.py:90-96). MEASURED (round-5 ImageFolder A/B, 2 seeds, identical
init/data): order deltas +0.022/-0.012 final acc -- within seed noise --
and native-size decode of small sources is ~4.6x faster host-side
(ROUND5_NOTES); pass ``--load_size`` to rotate closer to native
resolution at the cost of host decode bandwidth.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

MEAN = 0.5
STD = 0.5


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] -> float (x/255 - mean)/std."""
    return (x.astype(jnp.float32) / 255.0 - MEAN) / STD


def resize(x: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Bilinear resize of an NHWC batch to (size, size)."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


def _rotate_nearest(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate one (H, W, C) image by ``angle`` radians about its center.

    Nearest-neighbor resampling with zero fill (torchvision RandomRotation default).
    """
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    ys = cos * yy + sin * xx + cy
    xs = -sin * yy + cos * xx + cx
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    out = img[yi, xi]
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def random_augment(key: jax.Array, x: jnp.ndarray,
                   max_rotate_deg: float = 10.0) -> jnp.ndarray:
    """Per-sample RandomHorizontalFlip(p=.5) + RandomRotation(+/-deg) on an NHWC batch.

    Flip+rotation run in one fused Pallas kernel (ops/rotate_pallas.py). The
    exact per-pixel rotation gather (`_rotate_nearest`) lowers to the TPU
    scalar path (~38 ms/step + ~5 min compile at 224^2 batch 64); the kernel
    does masked VMEM rolls instead (~1-4 ms, seconds to compile) at the cost
    of <=~4% of pixels picking a horizontally adjacent source pixel (see the
    kernel docstring; MEDMAMBA_EXACT_ROTATE=1 restores the exact gather).
    """
    b = x.shape[0]
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    if max_rotate_deg == 0.0:
        return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    max_rad = max_rotate_deg * math.pi / 180.0
    angles = jax.random.uniform(
        k_rot, (b,), minval=-max_rad, maxval=max_rad)
    if os.environ.get("MEDMAMBA_EXACT_ROTATE"):
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        return jax.vmap(_rotate_nearest)(x, angles)
    from medmamba_tpu.ops.rotate_pallas import rotate_flip_pallas
    return rotate_flip_pallas(x, angles, flip, max_rad=max_rad)


@functools.partial(jax.jit, static_argnames=("size", "augment"))
def preprocess(key: jax.Array, images: jnp.ndarray, *, size: int = 224,
               augment: bool = False) -> jnp.ndarray:
    """uint8 NHWC batch -> normalized float32 (B, size, size, 3).

    Matches the reference transform order: flip/rotate at native resolution,
    then resize, then normalize (train.py:90-96). Augmentation runs in fp32:
    uint8 elementwise/gather ops lower poorly on TPU (measured 2x slower).
    """
    x = images.astype(jnp.float32)
    if augment:
        x = random_augment(key, x)
    x = resize(x, size)
    return normalize(x)
