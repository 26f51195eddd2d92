"""DarkNet-53 in Flax — completes the reference CLI's example-name surface.

The reference's ``--model_name`` help suggests arbitrary timm names with
exactly two examples: "ex. darknet53, ig_resnext101_32x32d"
(train/train.py:488, train/train_vit_triplet.py:468). The ResNeXt example
lives in models/resnet.py; this is the other one — the classic DarkNet-53
(YOLOv3 backbone): a 3x3/32 stem, five stages of (stride-2 3x3 channel
doubling + N residual bottlenecks), BatchNorm + LeakyReLU(0.1) throughout.

Note on timm: the reference pins timm==0.4.12, which does NOT actually ship
``darknet53`` (only cspdarknet53) — its own example would fail. We implement
the canonical architecture with modern-timm cspnet state-dict naming
(``stem.conv1.conv``, ``stages.N.conv_down``, ``stages.N.blocks.M.conv{1,2}``,
``head.fc``) so published darknet53 checkpoints convert
(models/convert.py::darknet_key_map).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from imageretrievalresearch_tpu.ops.pooling import get_fm
from imageretrievalresearch_tpu.models.layers import make_divisible, torch_pad

_LEAKY_SLOPE = 0.1  # canonical darknet activation


class DarkBlock(nn.Module):
    """Residual bottleneck: 1x1 to chs/2 -> 3x3 to chs, identity add."""

    chs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        y = nn.Conv(self.chs // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.leaky_relu(bn("bn1")(y), negative_slope=_LEAKY_SLOPE)
        y = nn.Conv(self.chs, (3, 3), padding=torch_pad(3), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.leaky_relu(bn("bn2")(y), negative_slope=_LEAKY_SLOPE)
        return x + y


class DarkNet(nn.Module):
    """DarkNet-53 (depths (1,2,8,8,4), channels 64..1024)."""

    depths: Sequence[int] = (1, 2, 8, 8, 4)
    width_mult: float = 1.0
    num_classes: int = 1000
    dtype: Any = jnp.float32

    def _chs(self, base: int) -> int:
        return (base if self.width_mult == 1.0
                else make_divisible(base * self.width_mult))

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.forward_features(x, train)
        return self.head(fm, train)

    @nn.compact_name_scope
    def forward_features(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        x = nn.Conv(self._chs(32), (3, 3), padding=torch_pad(3),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.leaky_relu(bn("stem_bn")(x), negative_slope=_LEAKY_SLOPE)
        for sidx, depth in enumerate(self.depths):
            chs = self._chs(64 * 2 ** sidx)
            x = nn.Conv(chs, (3, 3), strides=2, padding=torch_pad(3),
                        use_bias=False, dtype=self.dtype,
                        name=f"stage{sidx}_down_conv")(x)
            x = nn.leaky_relu(bn(f"stage{sidx}_down_bn")(x),
                              negative_slope=_LEAKY_SLOPE)
            for i in range(depth):
                x = DarkBlock(chs, dtype=self.dtype,
                              name=f"stage{sidx}_block{i}")(x, train)
        return x

    @nn.compact_name_scope
    def head(self, fm, train: bool = False):
        x = get_fm(fm)
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)

    @property
    def num_features(self) -> int:
        return self._chs(64 * 2 ** (len(self.depths) - 1))


DARKNET_CONFIGS = {
    "darknet53": dict(depths=(1, 2, 8, 8, 4)),
}
