"""Fused flip + small-angle rotation Pallas kernel for batched augmentation.

Replaces the torchvision RandomHorizontalFlip + RandomRotation pair
(reference pipeline, train.py:90-96) for the on-device augmentation path.

Why a kernel: nearest-neighbor rotation is a per-pixel 2D gather, which XLA
lowers to the TPU scalar path (~38 ms/step at 224x224 batch 64, plus ~5 min
of compile time); roll-select formulations in XLA materialize every shifted
copy in HBM (~18 ms). Here the whole image plane sits in VMEM and the gather
becomes masked static rolls (VPU selects): ~1-4 ms/step, compiles in seconds.

Algorithm: two-pass row/column decomposition of the inverse rotation map.
  pass 1 (horizontal): mid[r, j] = x[r, round(-s*di_hat + c*dj + cx)]
      with di_hat = (r - cy - s*dj)/c  (the row-index inverse estimate)
  pass 2 (vertical):   out[i, j] = mid[round(c*di + s*dj + cy), j]
An exact nearest rotation is not separable into two 1D gathers: inverting
i from the rounded row index is ambiguous by +-0.5/c, so <=~4% of pixels pick
a horizontally adjacent source pixel vs. the exact map (measured at 10 deg;
0% at 0 deg). This is an augmentation-only path -- the angle distribution is
exact and the resampling stays nearest-with-zero-fill; the exact gather
(`transforms._rotate_nearest`) remains the reference implementation, and the
two already differ from PIL's rotate rounding by a similar amount.
MEASURED accuracy impact (round-5 A/B, 2 seeds, identical init/data,
ROUND5_NOTES): none -- exact-rotate finals were -0.016/-0.015 vs this
kernel, within seed noise.

Each pass scans the statically-bounded shift range (tmax ~ sin(max_deg) *
W/2) with masked rolls; both masks derive from in-kernel iota index fields,
so the only per-image inputs are sin/cos/flip scalars (SMEM prefetch).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    from medmamba_tpu.ops.pallas_scan import _interpret as _i
    return _i()


def _shift(x, t: int, axis: int):
    """out[..., i, ...] = x[..., i + t, ...], zero fill (Mosaic-friendly:
    static slices + concat; jnp.roll emits 0-width slices at t=0)."""
    if t == 0:
        return x
    sl = [slice(None)] * x.ndim
    shape = list(x.shape)
    if t > 0:
        sl[axis] = slice(t, None)
        shape[axis] = t
        return jnp.concatenate(
            [x[tuple(sl)], jnp.zeros(shape, x.dtype)], axis=axis)
    sl[axis] = slice(None, t)
    shape[axis] = -t
    return jnp.concatenate(
        [jnp.zeros(shape, x.dtype), x[tuple(sl)]], axis=axis)


def _rot_kernel(sin_ref, cos_ref, x_ref, o_ref,
                *, h: int, w: int, tmax_h: int, tmax_v: int):
    b = pl.program_id(0)
    s = sin_ref[b]
    c = cos_ref[b]
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    di = jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 0).astype(jnp.float32) - cy
    dj = jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1).astype(jnp.float32) - cx

    x = x_ref[0, 0]

    big = jnp.int32(2 * (h + w))
    # horizontal pass: shift field tx = Xt - j, bounded by tmax_h
    di_hat = (di - s * dj) / c
    xt = jnp.round(-s * di_hat + c * dj + cx)
    validh = (xt >= 0) & (xt <= w - 1)
    txi = jnp.where(validh, (xt - (dj + cx)).astype(jnp.int32), big)
    mid = jnp.zeros_like(x)
    for t in range(-tmax_h, tmax_h + 1):
        mid = jnp.where(txi == t, _shift(x, t, axis=1), mid)
    # vertical pass: shift field ty = Y - i, bounded by tmax_v
    yf = jnp.round(c * di + s * dj + cy)
    validv = (yf >= 0) & (yf <= h - 1)
    tyi = jnp.where(validv, (yf - (di + cy)).astype(jnp.int32), big)
    out = jnp.zeros_like(x)
    for t in range(-tmax_v, tmax_v + 1):
        out = jnp.where(tyi == t, _shift(mid, t, axis=0), out)
    o_ref[0, 0] = out


@functools.partial(jax.jit, static_argnames=("max_rad",))
def rotate_flip_pallas(x: jax.Array, angles: jax.Array, flip: jax.Array,
                       *, max_rad: float) -> jax.Array:
    """Per-image horizontal flip then rotation of an NHWC fp32 batch.

    angles (B,) radians with |angle| <= max_rad (static bound; shifts outside
    the unrolled range would be dropped); flip (B,) bool/int.
    """
    bsz, h, w, ch = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    s, c = math.sin(max_rad), math.cos(max_rad)
    tmax_h = int(math.ceil(s * (cy + s * cx) / c + (1 - c) * cx)) + 1
    tmax_v = int(math.ceil((1 - c) * cy + s * cx)) + 1

    kernel = functools.partial(_rot_kernel, h=h, w=w,
                               tmax_h=tmax_h, tmax_v=tmax_v)
    grid = (bsz, ch)
    # flip outside the kernel (Mosaic has no lane-reverse primitive); one
    # fused XLA select pass. The transpose gives the kernel (H, W) planes.
    x = jnp.where(flip.reshape(-1, 1, 1, 1) != 0, x[:, :, ::-1, :], x)
    xp = x.transpose(0, 3, 1, 2)  # planes: (B, C, H, W)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1, h, w), lambda b, c_, *_: (b, c_, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, h, w), lambda b, c_, *_: (b, c_, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(jnp.sin(angles.astype(jnp.float32)),
      jnp.cos(angles.astype(jnp.float32)), xp)
    return out.transpose(0, 2, 3, 1)
