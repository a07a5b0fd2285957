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
(train.py:90-96); pass a larger ``--load_size`` to rotate closer to native
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


def _row_shift(x: jnp.ndarray, shifts: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Shift each row of an NHWC batch horizontally by a per-(batch,row)
    integer amount, zero fill.

    Implemented as full-row dynamic slices out of a padded image: B*H gathers
    of contiguous rows instead of B*H*W per-pixel gathers -- the latter runs
    on the TPU's scalar path at ~100 M idx/s and cost 32 ms/step in round 2
    profiling; this is bandwidth-bound and ~10x cheaper.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    starts = jnp.clip(pad - shifts, 0, 2 * pad).astype(jnp.int32)

    def take_row(row, s):  # (W+2P, C) -> (W, C)
        return jax.lax.dynamic_slice(row, (s, 0), (w, c))

    return jax.vmap(jax.vmap(take_row))(xp, starts)


def _rotate_shear(x: jnp.ndarray, angles: jnp.ndarray,
                  max_rad: float) -> jnp.ndarray:
    """Batched small-angle rotation by three integer shears (nearest, zero
    fill): rotate(t) = shear_x(-tan(t/2)) o shear_y(sin t) o shear_x(-tan(t/2)).

    Each shear is a per-row (or per-column, via transpose) shift, so the whole
    rotation is three row-slice gathers + two transposes -- the TPU-native
    formulation of the reference's RandomRotation (train.py:92). The discrete
    result differs from the direct inverse-map nearest rotation by occasional
    single-pixel disagreements (same augmentation distribution); the exact
    per-pixel-gather path is kept for parity experiments
    (MEDMAMBA_ROTATE=exact).
    """
    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    alpha = jnp.tan(angles / 2.0)                      # (B,)
    beta = -jnp.sin(angles)
    amax = abs(math.tan(max_rad / 2.0))
    bmax = abs(math.sin(max_rad))
    pad_x = int(math.ceil(amax * max(h, w) / 2.0)) + 1
    pad_y = int(math.ceil(bmax * max(h, w) / 2.0)) + 1

    yy = jnp.arange(h, dtype=jnp.float32) - cy         # (H,)
    xx = jnp.arange(w, dtype=jnp.float32) - cx         # (W,)
    sx = jnp.round(alpha[:, None] * yy[None, :])       # (B, H)
    sy = jnp.round(beta[:, None] * xx[None, :])        # (B, W)

    out = _row_shift(x, sx, pad_x)
    out = jnp.swapaxes(out, 1, 2)                      # shear_y as a row shear
    out = _row_shift(out, sy, pad_y)
    out = jnp.swapaxes(out, 1, 2)
    return _row_shift(out, sx, pad_x)


def random_augment(key: jax.Array, x: jnp.ndarray,
                   max_rotate_deg: float = 10.0) -> jnp.ndarray:
    """Per-sample RandomHorizontalFlip(p=.5) + RandomRotation(+/-deg) on an NHWC batch."""
    b = x.shape[0]
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    if max_rotate_deg == 0.0:
        return x
    max_rad = max_rotate_deg * math.pi / 180.0
    angles = jax.random.uniform(
        k_rot, (b,), minval=-max_rotate_deg, maxval=max_rotate_deg) * (jnp.pi / 180)
    if os.environ.get("MEDMAMBA_ROTATE") == "exact":
        return jax.vmap(_rotate_nearest)(x, angles)
    return _rotate_shear(x, angles, max_rad)


@functools.partial(jax.jit, static_argnames=("size", "augment"))
def preprocess(key: jax.Array, images: jnp.ndarray, *, size: int = 224,
               augment: bool = False) -> jnp.ndarray:
    """uint8 NHWC batch -> normalized float32 (B, size, size, 3).

    Matches the reference transform order: flip/rotate at native resolution,
    then resize, then normalize (train.py:90-96).
    """
    x = images.astype(jnp.float32)
    if augment:
        x = random_augment(key, x)
    x = resize(x, size)
    return normalize(x)
