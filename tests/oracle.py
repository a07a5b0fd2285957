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


def layer_norm_oracle(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def silu(x):
    return x / (1.0 + np.exp(-x))


def depthwise_conv2d_oracle(x, kernel, bias):
    """x: (b,h,w,c); kernel: (kh,kw,1,c) cross-correlation, SAME padding."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros_like(x)
    for i in range(kh):
        for j in range(kw):
            out += xp[:, i:i + h, j:j + w, :] * kernel[i, j, 0][None, None, None, :]
    return out + bias


def ss2d_oracle(x, p, d_state=16):
    """Independent numpy forward of the SS2D module (MedMamba.py:288-305 semantics).

    x: (b,h,w,d_model); p: flax param dict for one SS2D module.
    """
    b, h, w, d_model = x.shape
    l = h * w
    d_inner = p["conv2d"]["bias"].shape[0]
    dt_rank = p["dt_projs_weight"].shape[-1]
    n = d_state

    xz = x @ p["in_proj"]["kernel"]
    xc, z = xz[..., :d_inner], xz[..., d_inner:]
    xc = silu(depthwise_conv2d_oracle(xc, p["conv2d"]["kernel"], p["conv2d"]["bias"]))

    xs = cross_scan_oracle(xc)  # (b,4,d,l)
    x_dbl = np.einsum("bkdl,kcd->bkcl", xs, p["x_proj_weight"])
    dts, Bs, Cs = (x_dbl[:, :, :dt_rank], x_dbl[:, :, dt_rank:dt_rank + n],
                   x_dbl[:, :, dt_rank + n:])
    dts = np.einsum("bkrl,kdr->bkdl", dts, p["dt_projs_weight"])

    u = xs.reshape(b, 4 * d_inner, l)
    delta = dts.reshape(b, 4 * d_inner, l)
    A = -np.exp(p["A_logs"])
    y = selective_scan_oracle(u, delta, A, Bs, Cs, p["Ds"],
                              p["dt_projs_bias"].reshape(-1), delta_softplus=True)
    ys = y.reshape(b, 4, d_inner, l)
    y0 = ys[:, 0]
    y2 = ys[:, 2][:, :, ::-1]
    y1 = np.transpose(ys[:, 1].reshape(b, d_inner, w, h), (0, 1, 3, 2)).reshape(b, d_inner, l)
    y3 = np.transpose(ys[:, 3][:, :, ::-1].reshape(b, d_inner, w, h), (0, 1, 3, 2)).reshape(b, d_inner, l)
    y = y0 + y1 + y2 + y3
    y = np.transpose(y, (0, 2, 1)).reshape(b, h, w, d_inner)
    y = layer_norm_oracle(y, p["out_norm"]["scale"], p["out_norm"]["bias"])
    y = y * silu(z)
    return y @ p["out_proj"]["kernel"]
