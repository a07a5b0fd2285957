"""Vision Transformer backbone (flax.linen) -- CAM-backbone parity.

The reference bundles a full ViT implementation used only as a Grad-CAM backbone
(``grad_cam/vit_model.py``: PatchEmbed :43, Attention :71, Mlp :114, Block :136,
VisionTransformer :164, factory fns :290-409). This is the TPU-native equivalent,
exposing the same factories; Grad-CAM integrates via
``medmamba_tpu.eval.gradcam.grad_cam`` with a target path of
("blocks_<last>", "norm1") -- the analogue of grad_cam/main_vit.py:42.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from medmamba_tpu.models.vssm import DropPath, trunc_normal_02


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=trunc_normal_02, name="proj")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class Attention(nn.Module):
    num_heads: int = 12
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_02, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        x = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        x = nn.Dense(c, kernel_init=trunc_normal_02, name="proj")(x)
        return nn.Dropout(self.proj_drop)(x, deterministic=deterministic)


class Mlp(nn.Module):
    hidden: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        out = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_02, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out, kernel_init=trunc_normal_02, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.num_heads, attn_drop=self.attn_drop,
                      proj_drop=self.drop, name="attn")(y, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path")(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(int(x.shape[-1] * self.mlp_ratio), self.drop,
                name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    representation_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        b = x.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim, name="patch_embed")(x)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", trunc_normal_02,
                         (1, n + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x],
                            axis=1) + pos
        x = nn.Dropout(self.drop_rate, name="pos_drop")(x, deterministic)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        for i in range(self.depth):
            x = Block(self.num_heads, self.mlp_ratio, self.drop_rate,
                      self.attn_drop_rate, dpr[i],
                      name=f"blocks_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = x[:, 0]
        if self.representation_size:
            x = nn.tanh(nn.Dense(self.representation_size,
                                 kernel_init=trunc_normal_02,
                                 name="pre_logits")(x))
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros,
                         name="head")(x)
        return x


def vit_reshape_transform(tokens, grid=14):
    """Drop the cls token and reshape to (B, grid, grid, C) for Grad-CAM
    (grad_cam/main_vit.py:11-30 analogue, NHWC)."""
    b, n, c = tokens.shape
    return tokens[:, 1:].reshape(b, grid, grid, c)


# Factories mirroring grad_cam/vit_model.py:290-409
def vit_base_patch16_224(num_classes=1000, **kw):
    return VisionTransformer(patch_size=16, embed_dim=768, depth=12,
                             num_heads=12, num_classes=num_classes, **kw)


def vit_base_patch32_224(num_classes=1000, **kw):
    return VisionTransformer(patch_size=32, embed_dim=768, depth=12,
                             num_heads=12, num_classes=num_classes, **kw)


def vit_large_patch16_224(num_classes=1000, **kw):
    return VisionTransformer(patch_size=16, embed_dim=1024, depth=24,
                             num_heads=16, num_classes=num_classes, **kw)


def vit_large_patch32_224(num_classes=1000, **kw):
    return VisionTransformer(patch_size=32, embed_dim=1024, depth=24,
                             num_heads=16, num_classes=num_classes, **kw)


def vit_huge_patch14_224(num_classes=1000, **kw):
    return VisionTransformer(patch_size=14, embed_dim=1280, depth=32,
                             num_heads=16, num_classes=num_classes, **kw)
