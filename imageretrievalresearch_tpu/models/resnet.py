"""ResNet / ResNeXt in Flax — broadens the timm-name surface.

The reference's CLI help suggests arbitrary timm names ("ex. darknet53,
ig_resnext101_32x32d", train/train.py:488); the trained recipes use
rexnet/efficientnet/swin, but ResNet-family coverage (incl. grouped-conv
ResNeXt) keeps common zoo names working. timm naming/arithmetic: conv1 7x7
s2 -> bn1 -> relu -> maxpool 3x3 s2 -> layer1..4 of Bottlenecks
(conv1/bn1, conv2/bn2 (stride, groups), conv3/bn3, downsample.0/.1) -> pool
-> fc.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from imageretrievalresearch_tpu.ops.pooling import get_fm
from imageretrievalresearch_tpu.models.layers import torch_pad


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        out_chs = self.planes * self.expansion
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        shortcut = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(width, (3, 3), strides=self.stride,
                    padding=torch_pad(3), feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.stride != 1 or in_chs != out_chs:
            shortcut = nn.Conv(out_chs, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = bn("downsample_bn")(shortcut)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    base_width: int = 64
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.forward_features(x, train)
        return self.head(fm, train)

    @nn.compact_name_scope
    def forward_features(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=torch_pad(7),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for sidx, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            for i in range(blocks):
                stride = (1 if sidx == 0 else 2) if i == 0 else 1
                x = Bottleneck(planes, stride, self.groups, self.base_width,
                               dtype=self.dtype,
                               name=f"layer{sidx + 1}_{i}")(x, train)
        return x

    @nn.compact_name_scope
    def head(self, fm, train: bool = False):
        x = get_fm(fm)
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)

    @property
    def num_features(self) -> int:
        return 512 * 4


RESNET_CONFIGS = {
    "resnet50": dict(layers=(3, 4, 6, 3)),
    "resnet101": dict(layers=(3, 4, 23, 3)),
    "resnet152": dict(layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(layers=(3, 4, 6, 3), groups=32, base_width=4),
    "resnext101_32x8d": dict(layers=(3, 4, 23, 3), groups=32, base_width=8),
    "ig_resnext101_32x32d": dict(layers=(3, 4, 23, 3), groups=32,
                                 base_width=32),
}
