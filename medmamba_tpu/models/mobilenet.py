"""MobileNetV2 (flax.linen) -- the reference evaluator's template backbone.

Parity with ``ConfusionMatrix/model.py`` (_make_divisible :5, ConvBNReLU :21,
InvertedResidual :31, MobileNetV2 :58). In this framework the ConfusionMatrix
CLI is wired to MedMamba directly, but the template backbone is kept for the
same offline-eval workflows.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from medmamba_tpu.models.vssm import kaiming_fan_out


def _make_divisible(ch, divisor=8, min_ch=None):
    if min_ch is None:
        min_ch = divisor
    new_ch = max(min_ch, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return new_ch


class ConvBNReLU(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        # explicit symmetric (k-1)//2 padding: torch semantics; flax "SAME"
        # pads asymmetrically for stride 2, which shifts the grid by a pixel
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=kaiming_fan_out, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu6(x)


class InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_shortcut = self.stride == 1 and in_ch == self.out_ch
        y = x
        if self.expand_ratio != 1:
            y = ConvBNReLU(hidden, kernel=1, name="expand")(y, train)
        y = ConvBNReLU(hidden, kernel=3, stride=self.stride, groups=hidden,
                       name="dw")(y, train)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                    kernel_init=kaiming_fan_out, name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="project_bn")(y)
        return x + y if use_shortcut else y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    alpha: float = 1.0
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train=False, deterministic=None):
        if deterministic is None:
            deterministic = not train
        input_channel = _make_divisible(32 * self.alpha)
        last_channel = _make_divisible(1280 * self.alpha)
        cfg = [  # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        x = ConvBNReLU(input_channel, stride=2, name="stem")(x, train)
        i = 0
        for t, c, n, s in cfg:
            out_ch = _make_divisible(c * self.alpha)
            for j in range(n):
                x = InvertedResidual(out_ch, s if j == 0 else 1, t,
                                     name=f"block_{i}")(x, train)
                i += 1
        x = ConvBNReLU(last_channel, kernel=1, name="head_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="classifier")(x)
