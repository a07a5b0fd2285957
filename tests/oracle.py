"""Pure-numpy oracles for test comparison.

``selective_scan_oracle`` is an independent implementation of the S6 recurrence with
the grouped-B/C call-site contract of the reference CUDA op (MedMamba.py:273-279),
written directly from the recurrence definition (no JAX, no torch) so that both the
JAX implementations and the Pallas kernel are tested against it.
"""
import numpy as np


def softplus(x):
    return np.logaddexp(x, 0.0)


def selective_scan_oracle(u, delta, A, B, C, D=None, delta_bias=None,
                          delta_softplus=False):
    """u,delta: (b,d,l); A: (d,n); B,C: (b,g,n,l); D: (d,); returns y (b,d,l) fp64."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    C = np.asarray(C, np.float64)
    b, d, l = u.shape
    n = A.shape[1]
    g = B.shape[1]
    dpg = d // g
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)[None, :, None]
    if delta_softplus:
        delta = softplus(delta)
    y = np.zeros((b, d, l))
    h = np.zeros((b, d, n))
    for t in range(l):
        dA = np.exp(delta[:, :, t, None] * A[None])              # (b,d,n)
        Bt = np.repeat(B[:, :, :, t], dpg, axis=1).reshape(b, d, n)
        Ct = np.repeat(C[:, :, :, t], dpg, axis=1).reshape(b, d, n)
        h = dA * h + (delta[:, :, t] * u[:, :, t])[:, :, None] * Bt
        y[:, :, t] = (h * Ct).sum(-1)
    if D is not None:
        y = y + u * np.asarray(D, np.float64)[None, :, None]
    return y


def cross_scan_oracle(x):
    """x: (b, h, w, d) -> (b, 4, d, l) via explicit loops (independent of jnp impl)."""
    b, h, w, d = x.shape
    l = h * w
    out = np.zeros((b, 4, d, l), x.dtype)
    xc = np.transpose(x, (0, 3, 1, 2))  # (b,d,h,w)
    out[:, 0] = xc.reshape(b, d, l)
    out[:, 1] = np.transpose(xc, (0, 1, 3, 2)).reshape(b, d, l)
    out[:, 2] = out[:, 0][:, :, ::-1]
    out[:, 3] = out[:, 1][:, :, ::-1]
    return out
