"""RexNet in Flax — the reference's default CLI backbone (rexnet_150).

``--model_name rexnet_150`` is the reference train.py default
(train/train.py:488); checkpoints also exist for rexnet_150/200
(checkpoints/checkpoints_path.txt:1-2).

Architecture (ReXNet, "Rank eXpansion Networks", timm rexnet.py semantics):

  stem: conv3x3 s2 -> round(32*w) chs, BN, SiLU
  16 LinearBottleneck blocks (layers [1,2,2,3,3,5], stage strides
  [1,2,2,2,1,2]); output channels grow linearly 16 -> 180 before width
  scaling; expand ratio 1 for the first block else 6; SE (with BatchNorm,
  ratio 1/12) on stages 3+; partial residual adds the input onto the first
  ``in_chs`` channels when stride==1 and in_chs <= out_chs.
  final 1x1 conv -> round(1280*w), SiLU  == forward_features output
  head: global-pool -> dropout -> Linear == model.head (ClassifierHead)
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from imageretrievalresearch_tpu.ops.pooling import get_fm
from imageretrievalresearch_tpu.models.layers import (
    ConvBnAct,
    SqueezeExcite,
    make_divisible,
    relu6,
)


def rexnet_block_cfg(width_mult: float = 1.0, depth_mult: float = 1.0,
                     initial_chs: int = 16, final_chs: int = 180,
                     se_ratio: float = 1 / 12, ch_div: int = 1):
    """Per-block (out_chs, exp_ratio, stride, se_ratio) — timm's _block_cfg."""
    layers = [math.ceil(el * depth_mult) for el in [1, 2, 2, 3, 3, 5]]
    strides = sum([[s] + [1] * (n - 1)
                   for s, n in zip([1, 2, 2, 2, 1, 2], layers)], [])
    exp_ratios = [1] * layers[0] + [6] * sum(layers[1:])
    depth = sum(layers)
    base_chs = initial_chs / width_mult if width_mult < 1.0 else initial_chs
    out_chs_list = []
    for _ in range(depth):
        out_chs_list.append(make_divisible(round(base_chs * width_mult),
                                           divisor=ch_div))
        # timm/official ramp: += final_chs/depth (NOT (final-initial)/depth)
        # — the well-known 16,27,38,...,174,185 progression for rexnet_100;
        # real published checkpoints shape-match only with this rule
        base_chs += final_chs / depth
    se_ratios = [0.0] * (layers[0] + layers[1]) + [se_ratio] * sum(layers[2:])
    return list(zip(out_chs_list, exp_ratios, strides, se_ratios))


class LinearBottleneck(nn.Module):
    """timm LinearBottleneck: 1x1 expand (SiLU) -> 3x3 dw -> SE -> ReLU6 ->
    1x1 linear, with the partial channel residual."""

    out_chs: int
    stride: int
    exp_ratio: int
    se_ratio: float = 0.0
    ch_div: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        if self.exp_ratio != 1:
            mid = make_divisible(round(in_chs * self.exp_ratio),
                                 divisor=self.ch_div)
            x = ConvBnAct(mid, 1, act=nn.silu, dtype=self.dtype,
                          name="conv_exp")(x, train)
        else:
            mid = in_chs
        x = ConvBnAct(mid, 3, stride=self.stride, groups=mid, act=None,
                      dtype=self.dtype, name="conv_dw")(x, train)
        if self.se_ratio > 0:
            rd = make_divisible(int(mid * self.se_ratio), divisor=self.ch_div)
            x = SqueezeExcite(rd, act=nn.relu, use_norm=True,
                              dtype=self.dtype, name="se")(x, train)
        x = relu6(x)
        x = ConvBnAct(self.out_chs, 1, act=None, dtype=self.dtype,
                      name="conv_pwl")(x, train)
        if self.stride == 1 and in_chs <= self.out_chs:
            # partial residual: add input onto the first in_chs channels
            x = jnp.concatenate(
                [x[..., :in_chs] + shortcut, x[..., in_chs:]], axis=-1)
        return x


class RexNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    drop_rate: float = 0.2
    ch_div: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.forward_features(x, train)
        return self.head(fm, train)

    @nn.compact_name_scope
    def forward_features(self, x, train: bool = False):
        stem_chs = 32 / self.width_mult if self.width_mult < 1.0 else 32
        stem_chs = make_divisible(round(stem_chs * self.width_mult),
                                  divisor=self.ch_div)
        x = ConvBnAct(stem_chs, 3, stride=2, act=nn.silu, dtype=self.dtype,
                      name="stem")(x, train)
        for i, (c, e, s, se) in enumerate(
                rexnet_block_cfg(self.width_mult, self.depth_mult,
                                 ch_div=self.ch_div)):
            x = LinearBottleneck(c, s, e, se, self.ch_div, dtype=self.dtype,
                                 name=f"features_{i}")(x, train)
        pen_chs = make_divisible(1280 * self.width_mult, divisor=self.ch_div)
        x = ConvBnAct(pen_chs, 1, act=nn.silu, dtype=self.dtype,
                      name="final_conv")(x, train)
        return x

    @nn.compact_name_scope
    def head(self, fm, train: bool = False):
        """ClassifierHead parity: accepts the 4D map (pool inside, like
        timm's model.head at train/train.py:195) or pre-pooled features."""
        x = get_fm(fm)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(
            x.astype(self.dtype))

    @property
    def num_features(self) -> int:
        return make_divisible(1280 * self.width_mult, divisor=self.ch_div)


REXNET_CONFIGS = {
    "rexnet_100": dict(width_mult=1.0),
    "rexnet_130": dict(width_mult=1.3),
    "rexnet_150": dict(width_mult=1.5),
    "rexnet_200": dict(width_mult=2.0),
}
