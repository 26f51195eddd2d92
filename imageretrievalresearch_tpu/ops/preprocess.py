"""Fused, jit-compiled batched image preprocessing.

Replaces the reference's per-sample torchvision Compose pipelines with one
batched XLA program per transform spec:

- ``Resize((224,224)) -> ToTensor()`` training transforms
  (reference train/train.py:48-50)
- ``Resize -> AutoAugment.ImageNetPolicy() -> ToTensor`` augmented training
  (reference train/train_efficientnet.py:49-64)
- ``SquarePad -> ToTensor -> Normalize(ImageNet)`` inference transforms
  (reference inference/inference.py:48-62, utils/square_pad.py:20-36)

Layout is NHWC throughout (TPU-native; the reference's CHW is a
CUDA/cuDNN-ism). ``ToTensor`` semantics = uint8 -> float / 255.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def square_pad(images: jax.Array, *, fill: int = 255) -> jax.Array:
    """Pad a (B, H, W, C) batch to square with ``fill`` (SquarePad parity).

    reference utils/square_pad.py:29-36: left/top get ``(max-d)//2``, the
    odd remainder goes to right/bottom. Shapes are static under jit, so this
    is a single static pad op.
    """
    h, w = images.shape[1], images.shape[2]
    m = max(h, w)
    hp, hp_rem = (m - w) // 2, (m - w) % 2
    vp, vp_rem = (m - h) // 2, (m - h) % 2
    pad = ((0, 0), (vp, vp + vp_rem), (hp, hp + hp_rem), (0, 0))
    return jnp.pad(images, pad, constant_values=jnp.asarray(fill, images.dtype))


def resize_bilinear(images: jax.Array, size: tuple[int, int],
                    *, antialias: bool = True) -> jax.Array:
    """Batched bilinear resize ≈ torchvision Resize on PIL (antialias)."""
    b, _, _, c = images.shape
    out = jax.image.resize(images.astype(jnp.float32),
                           (b, size[0], size[1], c),
                           method="bilinear", antialias=antialias)
    return out


@dataclasses.dataclass(frozen=True)
class TransformSpec:
    """Declarative per-role transform pipeline (one of qry/pos/neg).

    Order of application mirrors the reference Compose pipelines:
    square_pad -> resize -> autoaugment (on uint8) -> to float [0,1]
    -> normalize.
    """

    resize: tuple[int, int] | None = (224, 224)
    square_pad_fill: int | None = None       # None = no SquarePad
    autoaugment: bool = False                # ImageNetPolicy
    normalize: tuple[tuple[float, ...], tuple[float, ...]] | None = None
    dtype: str = "float32"                   # output dtype ("bfloat16" on TPU)

    @staticmethod
    def train_plain(size: int = 224) -> "TransformSpec":
        """Resize + ToTensor (train/train.py:48-50)."""
        return TransformSpec(resize=(size, size))

    @staticmethod
    def train_autoaugment(size: int = 224) -> "TransformSpec":
        """Resize + AutoAugment ImageNetPolicy + ToTensor
        (train/train_efficientnet.py:49-64)."""
        return TransformSpec(resize=(size, size), autoaugment=True)

    @staticmethod
    def eval_squarepad(size: int | None = None) -> "TransformSpec":
        """SquarePad + ToTensor + Normalize(ImageNet)
        (inference/inference.py:48-62). ``size`` optionally resizes after
        padding (the reference dataset pre-sizes its images)."""
        return TransformSpec(resize=(size, size) if size else None,
                             square_pad_fill=255,
                             normalize=(IMAGENET_MEAN, IMAGENET_STD))


def _apply(spec: TransformSpec, images: jax.Array,
           key: jax.Array | None) -> jax.Array:
    x = images
    if spec.square_pad_fill is not None:
        x = square_pad(x, fill=spec.square_pad_fill)
    if spec.resize is not None and (x.shape[1], x.shape[2]) != spec.resize:
        x = resize_bilinear(x, spec.resize)
    if spec.autoaugment:
        # deferred import: autoaugment pulls in its op table
        from imageretrievalresearch_tpu.ops.autoaugment import imagenet_policy_batch
        if key is None:
            raise ValueError("autoaugment transform requires a PRNG key")
        if x.dtype != jnp.uint8:
            # round (not truncate) post-resize floats back to the uint8
            # domain AutoAugment operates in (PIL pipelines are uint8-chained)
            x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
        x = imagenet_policy_batch(x, key)
    x = x.astype(jnp.float32) / 255.0
    if spec.normalize is not None:
        mean, std = spec.normalize
        x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(spec.dtype)


def build_batch_transform(spec: TransformSpec) -> Callable:
    """Compile a spec into ``fn(uint8 NHWC batch, key=None) -> float NHWC``."""

    @functools.partial(jax.jit, static_argnames=())
    def fn(images: jax.Array, key: jax.Array | None = None) -> jax.Array:
        return _apply(spec, images, key)

    return fn


def build_image_transform(spec: TransformSpec) -> Callable:
    """Fused jit transform for single-image classification batches
    (``{'image': u8 NHWC, 'label': i32}`` from the ImageFolder loader) —
    the T5 recipe's ``Compose([ToTensor()])`` equivalent
    (train/train_vit_crossentropy.py:47) plus the device resize the
    reference delegates to its pre-sized dataset."""

    @jax.jit
    def fn(batch: dict, key: jax.Array | None = None) -> dict:
        out = {"image": _apply(spec, batch["image"], key)}
        if "label" in batch:
            out["label"] = batch["label"]
        return out

    return fn


def build_triplet_transform(qry: TransformSpec, pos: TransformSpec,
                            neg: TransformSpec) -> Callable:
    """One fused jit program transforming a whole triplet batch dict.

    Takes the loader's ``{'qry': u8, 'pos': [u8...], 'neg': [u8...]}`` batch
    and returns float arrays; one device program instead of 3+ host loops.
    """

    @jax.jit
    def fn(batch: dict, key: jax.Array | None = None) -> dict:
        n_pos = len(batch["pos"])
        n_neg = len(batch["neg"])
        if key is not None:
            keys = jax.random.split(key, 1 + n_pos + n_neg)
            kq, kp, kn = keys[0], keys[1:1 + n_pos], keys[1 + n_pos:]
        else:
            kq = kp = kn = None
        out = {
            "qry": _apply(qry, batch["qry"], kq),
            "pos": [_apply(pos, b, None if kp is None else kp[j])
                    for j, b in enumerate(batch["pos"])],
            "neg": [_apply(neg, b, None if kn is None else kn[j])
                    for j, b in enumerate(batch["neg"])],
        }
        for extra in ("cat_idx", "prod_idx"):
            if extra in batch:
                out[extra] = batch[extra]
        return out

    return fn
