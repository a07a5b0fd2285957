"""Segmentation-decoder components (VMamba-UNet style).

The reference's development file carries decoder parts beyond the classifier:
``PatchExpand2D`` (temp.py:212-227), ``Final_PatchExpand2D`` (temp.py:230-245)
and ``VSSLayer_up`` (temp.py:595-656, upsample-first stage of SS_Conv_SSM
blocks). TPU-native equivalents, NHWC; they compose with
``medmamba_tpu.models.vssm.VSSM.backbone`` into a U-shaped segmentation net
(``VSSMSeg`` below).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from medmamba_tpu.models.vssm import (SSConvSSM, PatchEmbed2D, PatchMerging2D,
                                      VSSLayer, trunc_normal_02)


class PatchExpand2D(nn.Module):
    """2x spatial upsample via channel-to-space (temp.py:212-227).

    NOTE the reference's quirk: the module is constructed with ``dim`` equal to
    half the incoming channels (`self.dim = dim*2`); we take the incoming
    channel count directly from the input instead.
    """

    dim_scale: int = 2

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, 2H, 2W, C/2)
        b, h, w, c = x.shape
        p = self.dim_scale
        x = nn.Dense(p * c, use_bias=False, kernel_init=trunc_normal_02,
                     name="expand")(x)
        c_out = c // p
        x = x.reshape(b, h, w, p, p, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, c_out)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class FinalPatchExpand2D(nn.Module):
    """4x spatial upsample back to pixel resolution (temp.py:230-245)."""

    dim_scale: int = 4

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, 4H, 4W, C/4)
        b, h, w, c = x.shape
        p = self.dim_scale
        x = nn.Dense(p * c, use_bias=False, kernel_init=trunc_normal_02,
                     name="expand")(x)
        c_out = (p * c) // (p * p)
        x = x.reshape(b, h, w, p, p, c_out)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, c_out)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class VSSLayerUp(nn.Module):
    """Decoder stage: upsample-first, then depth x SS_Conv_SSM (temp.py:595-656)."""

    dim: int
    depth: int
    d_state: int = 16
    attn_drop: float = 0.0
    drop_path: Sequence[float] = ()
    upsample: bool = True
    use_checkpoint: bool = False
    dtype = jnp.float32
    scan_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.upsample:
            x = PatchExpand2D(name="upsample")(x)
        block_cls = SSConvSSM
        if self.use_checkpoint:
            block_cls = nn.remat(SSConvSSM, static_argnums=(2,))
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = block_cls(hidden_dim=self.dim, drop_path=dp,
                          attn_drop_rate=self.attn_drop, d_state=self.d_state,
                          dtype=self.dtype, scan_impl=self.scan_impl,
                          name=f"blocks_{i}")(x, deterministic)
        return x


class VSSMSeg(nn.Module):
    """U-shaped VSSM segmentation model: VSSM encoder stages + VSSLayerUp
    decoder with skip additions + FinalPatchExpand2D + 1x1 conv head."""

    num_classes: int = 2
    depths: Sequence[int] = (2, 2, 4, 2)
    depths_decoder: Sequence[int] = (2, 4, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    d_state: int = 16
    drop_path_rate: float = 0.1
    scan_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dims = list(self.dims)
        x = PatchEmbed2D(embed_dim=dims[0], name="patch_embed")(x)
        skips = []
        n = len(self.depths)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        for i in range(n):
            skips.append(x)
            x = VSSLayer(dim=dims[i], depth=self.depths[i],
                         d_state=self.d_state,
                         drop_path=dpr[sum(self.depths[:i]):
                                       sum(self.depths[:i + 1])],
                         downsample=i < n - 1, scan_impl=self.scan_impl,
                         name=f"layers_{i}")(x, deterministic)
        for i in range(n):
            j = n - 1 - i
            x = VSSLayerUp(dim=dims[j], depth=self.depths_decoder[i],
                           d_state=self.d_state, upsample=i > 0,
                           scan_impl=self.scan_impl,
                           name=f"layers_up_{i}")(x, deterministic)
            if i > 0:
                x = x + skips[j]
        x = FinalPatchExpand2D(name="final_up")(x)
        return nn.Conv(self.num_classes, (1, 1), name="head")(x)
