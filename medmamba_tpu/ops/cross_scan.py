"""CrossScan / CrossMerge: the 4-direction sequence construction of SS2D.

Semantics match the reference ``SS2D.forward_corev0`` (``MedMamba.py:256-257`` for the
scan, ``MedMamba.py:282-286`` for the merge):

  direction 0: row-major raster          (H major, W minor)
  direction 1: column-major raster       (W major, H minor; spatial transpose)
  direction 2: reverse of direction 0
  direction 3: reverse of direction 1

CrossMerge re-aligns all four output sequences to row-major order (un-flip dirs 2,3;
un-transpose dirs 1,3) so they can be summed. ``cross_merge(cross_scan(x))`` applied
per-direction is the identity; tests assert this round trip.

TPU note: inputs here are NHWC (the framework's native layout); the reference uses
NCHW. All ops are pure layout transforms (transpose/flip/reshape) that XLA fuses
into the neighbouring producers/consumers.
"""
from __future__ import annotations

import jax.numpy as jnp


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, D) -> (B, 4, D, L) with the 4 scan orders above."""
    b, h, w, d = x.shape
    l = h * w
    x_hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, d, l)          # row-major
    x_wh = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, d, l)          # col-major
    fwd = jnp.stack([x_hw, x_wh], axis=1)                            # (B, 2, D, L)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=-1)], axis=1)    # (B, 4, D, L)


def cross_merge(ys: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, 4, D, L) scan outputs -> (B, D, L) sum of the four re-aligned sequences.

    Mirrors MedMamba.py:282-286 followed by the ``y1+y2+y3+y4`` at :298.
    """
    b, k, d, l = ys.shape
    assert k == 4 and l == h * w
    inv = jnp.flip(ys[:, 2:4], axis=-1)                  # un-flip dirs 2,3
    y0 = ys[:, 0]
    y2 = inv[:, 0]
    # un-transpose dirs 1 and 3: stored (W, H)-major, return to (H, W)-major
    y1 = jnp.transpose(ys[:, 1].reshape(b, d, w, h), (0, 1, 3, 2)).reshape(b, d, l)
    y3 = jnp.transpose(inv[:, 1].reshape(b, d, w, h), (0, 1, 3, 2)).reshape(b, d, l)
    return y0 + y1 + y2 + y3
