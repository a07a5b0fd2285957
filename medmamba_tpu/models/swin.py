"""Swin Transformer backbone (flax.linen) -- CAM-backbone parity.

The reference bundles a full Swin implementation used as a Grad-CAM backbone
(``grad_cam/swin_model.py``: window_partition :48, window_reverse :66,
WindowAttention :191, SwinTransformerBlock :287, BasicLayer :379,
SwinTransformer :470, factories :567-678). TPU-native equivalent, NHWC.
Grad-CAM integrates via ``grad_cam`` with target path ("norm",) -- the analogue
of grad_cam/main_swin.py:50.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from medmamba_tpu.models.vssm import (DropPath, PatchMerging2D, trunc_normal_02)
from medmamba_tpu.models.vit import Mlp


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    """(B*nW, ws, ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (n, n)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        bnw, n, c = x.shape
        ws = self.window_size
        hd = c // self.num_heads
        table = self.param(
            "relative_position_bias_table", trunc_normal_02,
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(ws).reshape(-1))
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_02, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        x = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        x = nn.Dense(c, kernel_init=trunc_normal_02, name="proj")(x)
        return nn.Dropout(self.proj_drop)(x, deterministic=deterministic)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):  # (B, H, W, C)
        b, h, w, c = x.shape
        # NOTE: the reference swin (grad_cam/swin_model.py:335-366) pads up to
        # the window size and applies the cyclic shift REGARDLESS of feature
        # resolution (unlike official Swin, which zeroes the shift when the
        # window covers the whole map). Parity follows the reference.
        ws = self.window_size
        ss = self.shift_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            mask = _attn_mask(hp, wp, ws, ss)
        else:
            mask = None

        win = window_partition(x, ws).reshape(-1, ws * ws, c)
        win = WindowAttention(self.num_heads, ws, attn_drop=self.attn_drop,
                              proj_drop=self.drop,
                              name="attn")(win, mask, deterministic)
        x = window_reverse(win.reshape(-1, ws, ws, c), ws, hp, wp)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = shortcut + DropPath(self.drop_path, name="drop_path")(
            x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), self.drop, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


def _attn_mask(hp, wp, ws, ss):
    img = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
        for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
            img[:, hsl, wsl, :] = cnt
            cnt += 1
    win = window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return jnp.where(mask != 0, -100.0, 0.0)


class SwinTransformer(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=trunc_normal_02, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        x = nn.Dropout(self.drop_rate, name="pos_drop")(x, deterministic)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        k = 0
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(self.num_heads[i], self.window_size,
                              0 if j % 2 == 0 else self.window_size // 2,
                              self.mlp_ratio, self.drop_rate,
                              self.attn_drop_rate, dpr[k],
                              name=f"layers_{i}_blocks_{j}")(x, deterministic)
                k += 1
            if i < len(self.depths) - 1:
                x = PatchMerging2D(name=f"layers_{i}_downsample")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, kernel_init=trunc_normal_02,
                        name="head")(x)


# Factories mirroring grad_cam/swin_model.py:567-678
def swin_tiny_patch4_window7_224(num_classes=1000, **kw):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24),
                           num_classes=num_classes, **kw)


def swin_small_patch4_window7_224(num_classes=1000, **kw):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24),
                           num_classes=num_classes, **kw)


def swin_base_patch4_window7_224(num_classes=1000, **kw):
    return SwinTransformer(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32),
                           num_classes=num_classes, **kw)


def swin_large_patch4_window7_224(num_classes=1000, **kw):
    return SwinTransformer(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48),
                           num_classes=num_classes, **kw)
