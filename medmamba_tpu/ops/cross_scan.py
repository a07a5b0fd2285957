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


def cross_scan(x: jnp.ndarray, flip: bool = True) -> jnp.ndarray:
    """(B, H, W, D) -> (B, 4, D, L) with the 4 scan orders above.

    ``flip=False`` leaves directions 2/3 as UNFLIPPED copies of 0/1: the
    selective-scan kernel then runs them as native reverse-direction scans
    (``reverse_dirs``), so no flipped tensors are ever materialized.
    """
    b, h, w, d = x.shape
    l = h * w
    x_hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, d, l)          # row-major
    x_wh = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, d, l)          # col-major
    fwd = jnp.stack([x_hw, x_wh], axis=1)                            # (B, 2, D, L)
    bwd = jnp.flip(fwd, axis=-1) if flip else fwd
    return jnp.concatenate([fwd, bwd], axis=1)                       # (B, 4, D, L)


def cross_scan_fwd(x: jnp.ndarray, pad_to: int = 0) -> jnp.ndarray:
    """(B, H, W, D) -> (B, 2, D, L): row-major + column-major rasters only.

    Directions 2/3 of the reference CrossScan are exact reversals of 0/1
    (``MedMamba.py:257``); when the scan kernel runs them as native
    reverse-direction scans, their input data is bit-identical to 0/1 -- so
    the hot path never materializes the duplicated (B, 4, D, L) stack: the
    same (B, 2, D, L) tensor feeds one forward and one reverse scan call.

    ``pad_to`` > L: zero-pad the sequence axis once here (the scan consumes
    it with ``valid_len``), replacing separate u/dt/B/C pads downstream.
    """
    b, h, w, d = x.shape
    l = h * w
    x_hw = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, d, l)
    x_wh = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, d, l)
    xs = jnp.stack([x_hw, x_wh], axis=1)
    if pad_to > l:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, pad_to - l)))
    return xs


def cross_merge_fr(yf: jnp.ndarray, yr: jnp.ndarray, h: int, w: int
                   ) -> jnp.ndarray:
    """Merge (B, 2, D, Lp) forward-scan and reverse-scan outputs (both in
    buffer order) into (B, D, L): un-transpose the column-major pair and sum
    all four -- cross_merge(flipped=False) on [yf0, yf1, yr0, yr1]. Inputs
    may carry scan padding past L = h*w; it is sliced off here."""
    b, _, d, lp = yf.shape
    l = h * w
    y02 = (yf[:, 0] + yr[:, 0])[..., :l]
    y13 = (yf[:, 1] + yr[:, 1])[..., :l]
    y13 = jnp.transpose(y13.reshape(b, d, w, h), (0, 1, 3, 2)).reshape(b, d, l)
    return y02 + y13


def cross_merge(ys: jnp.ndarray, h: int, w: int,
                flipped: bool = True) -> jnp.ndarray:
    """(B, 4, D, L) scan outputs -> (B, D, L) sum of the four re-aligned sequences.

    Mirrors MedMamba.py:282-286 followed by the ``y1+y2+y3+y4`` at :298.
    ``flipped=False`` means directions 2/3 already arrive in buffer order
    (reverse-direction kernel scans), so no un-flip is needed.
    """
    b, k, d, l = ys.shape
    assert k == 4 and l == h * w
    inv = jnp.flip(ys[:, 2:4], axis=-1) if flipped else ys[:, 2:4]
    y02 = ys[:, 0] + inv[:, 0]
    # un-transpose dirs 1 and 3 together: stored (W, H)-major
    y13 = ys[:, 1] + inv[:, 1]
    y13 = jnp.transpose(y13.reshape(b, d, w, h), (0, 1, 3, 2)).reshape(b, d, l)
    return y02 + y13
