"""Backbone registry + the timm-like model surface the reference consumes.

``create_model(name, num_classes, ...)`` mirrors the reference's
``timm.create_model`` call sites (train/train.py:396,
inference/inference.py:102-110) and returns a :class:`Backbone` — a thin
functional wrapper pairing the Flax module with apply helpers:

- ``forward_features(variables, x)``  — 4D (CNN) / 3D (Swin) feature map
- ``head(variables, fm)``             — logits (or embeddings in
  ``embed_only`` mode, the reference's ``model.head = Identity()``)
- ``embed(variables, x)``             — ``get_fm(forward_features(x))``
- ``conv_input=True`` prepends the Conv2d(3,3,3x3)+SiLU stem
  (inference/inference.py:101-105)

Variables stay an explicit pytree (params + batch_stats), so everything
composes with jit/pjit/grad without object state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models.darknet import (
    DARKNET_CONFIGS,
    DarkNet,
)
from imageretrievalresearch_tpu.models.efficientnet import (
    EFFICIENTNET_CONFIGS,
    EfficientNet,
)
from imageretrievalresearch_tpu.models.layers import ConvStem
from imageretrievalresearch_tpu.models.resnet import RESNET_CONFIGS, ResNet
from imageretrievalresearch_tpu.models.rexnet import REXNET_CONFIGS, RexNet
from imageretrievalresearch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
from imageretrievalresearch_tpu.ops.pooling import get_fm

_REGISTRY: dict[str, Callable[..., nn.Module]] = {}


def _register_family(configs: dict, ctor: Callable[..., nn.Module]) -> None:
    for name, cfg in configs.items():
        _REGISTRY[name] = (lambda cfg=cfg, ctor=ctor, **kw:
                           ctor(**{**cfg, **kw}))


_register_family(EFFICIENTNET_CONFIGS, EfficientNet)
_register_family(REXNET_CONFIGS, RexNet)
_register_family(SWIN_CONFIGS, SwinTransformer)
_register_family(RESNET_CONFIGS, ResNet)
_register_family(DARKNET_CONFIGS, DarkNet)


def list_models() -> list[str]:
    return sorted(_REGISTRY)


@dataclasses.dataclass
class Backbone:
    """Functional model wrapper; all methods are pure in ``variables``."""

    name: str
    net: nn.Module
    stem: ConvStem | None = None
    embed_only: bool = False

    # --- init ---

    def init(self, rng: jax.Array, sample: jax.Array) -> dict:
        r1, r2 = jax.random.split(rng)
        variables = {}
        x = sample
        if self.stem is not None:
            stem_vars = self.stem.init(r1, x)
            variables["stem"] = stem_vars
            x = self.stem.apply(stem_vars, x)
        variables["net"] = self.net.init(r2, x, False)
        return variables

    # --- forward pieces ---

    def _stem_apply(self, variables: dict, x: jax.Array) -> jax.Array:
        if self.stem is not None:
            x = self.stem.apply(variables["stem"], x)
        return x

    def forward_features(self, variables: dict, x: jax.Array,
                         train: bool = False, rngs: dict | None = None,
                         mutable: bool = False):
        """Returns fm, or (fm, updated_net_vars) when ``mutable`` (BN stats).

        ``train=True`` with ``mutable=False`` runs BN in batch mode and
        DISCARDS the running-stat updates (flax would otherwise raise
        ModifyScopeVariableError on every BatchNorm backbone) — use
        ``mutable=True`` (or :meth:`features_and_logits`) when the updated
        stats matter, i.e. in a real training step."""
        x = self._stem_apply(variables, x)
        if mutable:
            fm, updates = self.net.apply(
                variables["net"], x, train, method="forward_features",
                rngs=rngs, mutable=["batch_stats"])
            return fm, updates
        if train and "batch_stats" in variables["net"]:
            fm, _ = self.net.apply(
                variables["net"], x, train, method="forward_features",
                rngs=rngs, mutable=["batch_stats"])
            return fm
        return self.net.apply(variables["net"], x, train,
                              method="forward_features", rngs=rngs)

    def head(self, variables: dict, fm: jax.Array, train: bool = False,
             rngs: dict | None = None) -> jax.Array:
        if self.embed_only:
            return get_fm(fm)
        return self.net.apply(variables["net"], fm, train, method="head",
                              rngs=rngs)

    def embed(self, variables: dict, x: jax.Array, train: bool = False,
              rngs: dict | None = None) -> jax.Array:
        """get_fm(forward_features(x)) — the reference's embedding path
        (train/train.py:194-208)."""
        return get_fm(self.forward_features(variables, x, train, rngs))

    def __call__(self, variables: dict, x: jax.Array, train: bool = False,
                 rngs: dict | None = None) -> jax.Array:
        fm = self.forward_features(variables, x, train, rngs)
        return self.head(variables, fm, train, rngs)

    def features_and_logits(self, variables: dict, x: jax.Array,
                            train: bool = False, rngs: dict | None = None,
                            mutable: bool = False):
        """One fused pass -> (pooled_embedding, logits[, updated_vars]).

        The reference runs forward_features then model.head on the *4D map*
        (train/train.py:194-195) for rexnet-style heads, or classifier on
        pooled features (train_efficientnet.py:226-230); both reduce to
        head-on-fm here since our heads pool internally.
        """
        if mutable:
            fm, updates = self.forward_features(variables, x, train, rngs,
                                                mutable=True)
        else:
            fm = self.forward_features(variables, x, train, rngs)
            updates = None
        emb = get_fm(fm)
        logits = self.head(variables, fm, train, rngs)
        if mutable:
            return emb, logits, updates
        return emb, logits

    def merge_updates(self, variables: dict, updates: dict) -> dict:
        """Fold mutable-collection updates (BN stats) back into variables."""
        net = dict(variables["net"])
        net.update(updates)
        out = dict(variables)
        out["net"] = net
        return out

    @property
    def num_features(self) -> int:
        return self.net.num_features


def create_model(model_name: str, num_classes: int = 1000,
                 conv_input: bool = False, embed_only: bool = False,
                 dtype: Any = jnp.float32, **kwargs) -> Backbone:
    """timm.create_model-equivalent factory.

    ``pretrained`` weights come from :mod:`models.convert` (torch checkpoint
    conversion) rather than a download; see Backbone.init for random init.
    """
    if model_name not in _REGISTRY:
        raise ValueError(
            f'Unknown model name "{model_name}". '
            f"Available models are: {list_models()}")
    net = _REGISTRY[model_name](num_classes=num_classes, dtype=dtype, **kwargs)
    stem = ConvStem(dtype=dtype) if conv_input else None
    return Backbone(name=model_name, net=net, stem=stem,
                    embed_only=embed_only)
