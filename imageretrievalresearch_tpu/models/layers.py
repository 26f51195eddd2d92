"""Shared Flax building blocks for the CNN backbones.

Conventions chosen for bit-compatibility with the timm/PyTorch models whose
checkpoints we convert (SURVEY.md hard part #1):

- NHWC layout (TPU-native; converter transposes OIHW -> HWIO).
- Explicit symmetric conv padding ``k//2`` — identical arithmetic to
  ``torch.nn.Conv2d(padding=k//2)``; we do NOT use XLA 'SAME' (which pads
  asymmetrically for stride 2).
- BatchNorm eps 1e-5 (torch default), running-stat momentum 0.9
  (= 1 - torch's 0.1).
- Compute dtype configurable (bf16 on TPU); params and BN stats stay f32.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None,
                   round_limit: float = 0.9) -> int:
    """timm's channel rounding rule (keeps converted shapes identical)."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def torch_pad(kernel_size: int) -> tuple[tuple[int, int], tuple[int, int]]:
    p = kernel_size // 2
    return ((p, p), (p, p))


class _PallasDWConv(nn.Module):
    """Depthwise conv routed through ``ops.pallas_conv.depthwise_conv2d``.

    Drop-in for ``nn.Conv(C, (K, K), feature_group_count=C, use_bias=False)``
    with the identical param tree (``kernel`` of HWIO shape (K, K, 1, C)), so
    torch->Flax converted checkpoints load unchanged. By default this
    computes the same XLA grouped conv the nn.Conv path would — the Pallas
    kernel measured slower in-graph and is opt-in via IRT_FORCE_PALLAS_DW
    (see ops/pallas_conv.py for the measured verdict).
    """

    kernel_size: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from imageretrievalresearch_tpu.ops.pallas_conv import depthwise_conv2d
        k, c = self.kernel_size, x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, 1, c), jnp.float32)
        return depthwise_conv2d(x.astype(self.dtype), w.astype(self.dtype),
                                stride=self.stride)


class ConvBnAct(nn.Module):
    """Conv2d + BatchNorm + optional activation, torch-parity arithmetic."""

    out_chs: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: Callable | None = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depthwise = (self.groups > 1 and self.groups == x.shape[-1]
                     and self.out_chs == x.shape[-1]
                     and self.kernel_size % 2 == 1 and self.kernel_size > 1)
        if depthwise:
            x = _PallasDWConv(self.kernel_size, self.stride,
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.out_chs, (self.kernel_size, self.kernel_size),
                        strides=self.stride,
                        padding=torch_pad(self.kernel_size),
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block: global-pool -> reduce conv -> act -> expand conv -> sigmoid gate.

    ``rd_chs`` is precomputed by the caller (EfficientNet rounds from the
    block's *input* channels; RexNet from the mid channels / 12).
    ``use_norm`` adds the BatchNorm that RexNet's SEWithNorm variant carries.
    """

    rd_chs: int
    act: Callable = nn.relu
    gate: Callable = jax.nn.sigmoid
    use_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        # bias stays on even with the norm (timm SEWithNorm keeps fc1 bias;
        # with eval-mode running stats the bias is NOT absorbed by the BN)
        se = nn.Conv(self.rd_chs, (1, 1), use_bias=True,
                     dtype=self.dtype, name="conv_reduce")(se)
        if self.use_norm:
            se = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype, name="bn")(se)
        se = self.act(se)
        se = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                     dtype=self.dtype, name="conv_expand")(se)
        return x * self.gate(se)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape=mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class Identity(nn.Module):
    """Embedding-only head (reference train_vit_triplet.py:357
    ``base_model.head = Identity()``)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class ConvStem(nn.Module):
    """Optional learned input stem: Conv2d(3,3,3x3,s1,p1,bias=False) + SiLU.

    Parity with the reference's ``conv_input`` option
    (inference/inference.py:101-105).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(3, (3, 3), strides=1, padding=torch_pad(3),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.silu(x)


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)
