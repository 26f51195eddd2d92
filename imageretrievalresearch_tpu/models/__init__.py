"""Flax embedding backbones with a timm-like ``forward_features`` / ``head`` split.

The reference consumes timm models through exactly three surfaces
(train/train.py:194-203, train_efficientnet.py:226-244,
train_vit_triplet.py:357):

- ``model.forward_features(x)`` -> 4D feature map (pre-pooling)
- ``model.head(fm)`` / ``model.classifier(pooled)`` -> class logits
- ``model.head = Identity()`` -> embedding-only mode

We reproduce that surface over Flax modules, NHWC layout, bf16-friendly.
"""

from imageretrievalresearch_tpu.models.backbone import (
    create_model,
    list_models,
    Backbone,
)

__all__ = ["create_model", "list_models", "Backbone"]
