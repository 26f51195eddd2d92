"""EfficientNet in Flax — the reference's flagship backbone (efficientnet_b3a).

The reference trains timm's ``efficientnet_b3a`` (train/train_efficientnet.py
default ``-mn efficientnet_b3a`` :540). In timm, b3a is architecturally
identical to b3 (width 1.2, depth 1.4) — the 'a' only changes eval crop — so
one builder parameterized by (width, depth) covers b0..b4 and both aliases.

Structure (timm EfficientNet, non-tf variants: symmetric torch padding,
BN eps 1e-5):

  conv_stem(3x3,s2) -> bn -> SiLU
  7 MBConv stages: k [3,3,5,3,5,5,3], c [16,24,40,80,112,192,320],
                   r [1,2,2,3,3,4,1], s [1,2,2,2,1,2,1], expand [1,6,...,6]
  conv_head(1x1 -> 1280*w) -> bn -> SiLU        == forward_features output
  head: global-pool -> dropout -> Linear        == model.classifier

SE reduction: ratio 0.25 of the block's *input* channels (timm convention).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from imageretrievalresearch_tpu.ops.pooling import get_fm
from imageretrievalresearch_tpu.models.layers import (
    ConvBnAct,
    DropPath,
    SqueezeExcite,
    make_divisible,
    torch_pad,
)

# (kernel, out_chs, repeats, stride, expand_ratio) per stage, B0 base
_B0_STAGES = (
    (3, 16, 1, 1, 1),
    (3, 24, 2, 2, 6),
    (5, 40, 2, 2, 6),
    (3, 80, 3, 2, 6),
    (5, 112, 3, 1, 6),
    (5, 192, 4, 2, 6),
    # final stage: ONE repeat (paper Table 1 / timm ir_r1_k3_s1_e6_c320 —
    # B0 is 16 blocks total; 5 here would hand b3a seven 320-channel
    # blocks where timm has two, and emit converter keys blocks.6.1+ that
    # no real timm checkpoint contains)
    (3, 320, 1, 1, 6),
)


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE; DepthwiseSeparable when expand=1."""

    out_chs: int
    kernel_size: int
    stride: int
    expand_ratio: int
    se_ratio: float = 0.25
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        shortcut = x
        mid = make_divisible(in_chs * self.expand_ratio)
        if self.expand_ratio != 1:
            x = ConvBnAct(mid, 1, act=nn.silu, dtype=self.dtype,
                          name="conv_pw")(x, train)
        x = ConvBnAct(mid, self.kernel_size, stride=self.stride, groups=mid,
                      act=nn.silu, dtype=self.dtype, name="conv_dw")(x, train)
        if self.se_ratio > 0:
            rd = max(1, int(in_chs * self.se_ratio))
            x = SqueezeExcite(rd, act=nn.silu, dtype=self.dtype,
                              name="se")(x, train)
        x = ConvBnAct(self.out_chs, 1, act=None, dtype=self.dtype,
                      name="conv_pwl")(x, train)
        if self.stride == 1 and in_chs == self.out_chs:
            x = DropPath(self.drop_path, name="drop_path")(x, train) + shortcut
        return x


class EfficientNet(nn.Module):
    """forward_features/head split mirrors timm (train_efficientnet.py:226-244)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.forward_features(x, train)
        return self.head(fm, train)

    @nn.compact_name_scope
    def forward_features(self, x, train: bool = False):
        w, d = self.width_mult, self.depth_mult
        x = ConvBnAct(make_divisible(32 * w), 3, stride=2, act=nn.silu,
                      dtype=self.dtype, name="conv_stem")(x, train)
        total_blocks = sum(_round_repeats(r, d) for _, _, r, _, _ in _B0_STAGES)
        bidx = 0
        for sidx, (k, c, r, s, e) in enumerate(_B0_STAGES):
            out_chs = make_divisible(c * w)
            for i in range(_round_repeats(r, d)):
                dp = self.drop_path_rate * bidx / max(1, total_blocks)
                x = MBConv(out_chs, k, s if i == 0 else 1, e,
                           drop_path=dp, dtype=self.dtype,
                           name=f"blocks_{sidx}_{i}")(x, train)
                bidx += 1
        x = ConvBnAct(make_divisible(1280 * w), 1, act=nn.silu,
                      dtype=self.dtype, name="conv_head")(x, train)
        return x

    @nn.compact_name_scope
    def head(self, fm, train: bool = False):
        """Pool + dropout + Linear. Accepts 4D maps or pre-pooled (B, C)."""
        x = get_fm(fm)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(x.astype(self.dtype))

    @property
    def num_features(self) -> int:
        return make_divisible(1280 * self.width_mult)


# (width, depth, default drop_rate) — timm model zoo coefficients
EFFICIENTNET_CONFIGS = {
    "efficientnet_b0": dict(width_mult=1.0, depth_mult=1.0, drop_rate=0.2),
    "efficientnet_b1": dict(width_mult=1.0, depth_mult=1.1, drop_rate=0.2),
    "efficientnet_b2": dict(width_mult=1.1, depth_mult=1.2, drop_rate=0.3),
    "efficientnet_b3": dict(width_mult=1.2, depth_mult=1.4, drop_rate=0.3),
    # b3a == b3 architecture; alias kept for CLI parity with the reference
    "efficientnet_b3a": dict(width_mult=1.2, depth_mult=1.4, drop_rate=0.3),
    "efficientnet_b4": dict(width_mult=1.4, depth_mult=1.8, drop_rate=0.4),
}
