"""Grad-CAM saliency via jax.grad — the reference's lost analysis capability.

The reference declares GradCAM analysis (README.md:8, deps
pytorch-gradcam/ttach) but the notebooks containing it are missing blobs
(SURVEY.md §2 X2). Reimplemented natively: the CAM is
``relu(Σ_c w_c · fm_c)`` with ``w_c`` the spatial mean of ``∂target/∂fm_c``,
where ``fm`` is the backbone's last feature map — one forward + one
jax.grad w.r.t. the feature map (no hooks needed in a functional model).

Targets:
- classification: the logit of a chosen class,
- retrieval (the north-star use): cosine similarity of the image's pooled
  embedding against a retrieved gallery embedding.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.losses import cosine_similarity
from imageretrievalresearch_tpu.models.backbone import Backbone
from imageretrievalresearch_tpu.ops.pooling import get_fm


def _spatialize(fm: jax.Array) -> jax.Array:
    """Transformer feature maps are (B, L, C) token sequences (Swin's
    forward_features, models/swin.py) — fold L back into the (H, W) grid
    so the CAM is spatial. CNN (B, H, W, C) maps pass through."""
    if fm.ndim == 4:
        return fm
    if fm.ndim == 3:
        b, length, c = fm.shape
        side = int(round(length ** 0.5))
        if side * side != length:
            raise ValueError(
                f"cannot spatialize a length-{length} token sequence "
                "(not a square grid)")
        return fm.reshape(b, side, side, c)
    raise ValueError(f"expected (B,H,W,C) or (B,L,C) feature map, "
                     f"got shape {fm.shape}")


def _cam_from_fm(fm: jax.Array, grads: jax.Array) -> jax.Array:
    """(B, H, W, C) or (B, L, C) fm + grads -> (B, H, W) normalized CAM."""
    fm, grads = _spatialize(fm), _spatialize(grads)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)     # (B,1,1,C)
    cam = jax.nn.relu(jnp.sum(weights * fm, axis=-1))         # (B,H,W)
    cam_min = jnp.min(cam, axis=(1, 2), keepdims=True)
    cam_max = jnp.max(cam, axis=(1, 2), keepdims=True)
    return (cam - cam_min) / jnp.maximum(cam_max - cam_min, 1e-8)


def grad_cam(backbone: Backbone, variables: dict, images: jax.Array,
             target_fn: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """Generic Grad-CAM: ``target_fn`` maps the feature map -> scalar-per-image.

    Returns (B, H, W) maps at feature-map resolution (upsample with
    jax.image.resize for overlays).
    """
    fm = backbone.forward_features(variables, images, train=False)

    def scalar_target(f):
        return jnp.sum(target_fn(f))

    grads = jax.grad(scalar_target)(fm)
    return _cam_from_fm(fm, grads)


def grad_cam_class(backbone: Backbone, variables: dict, images: jax.Array,
                   class_idx: jax.Array) -> jax.Array:
    """CAM for the class logit (classic Grad-CAM)."""

    def target(fm):
        logits = backbone.head(variables, fm)
        return jnp.take_along_axis(
            logits, jnp.atleast_1d(class_idx)[:, None], axis=1)[:, 0]

    return grad_cam(backbone, variables, images, target)


def grad_cam_pair(backbone: Backbone, variables: dict, images: jax.Array,
                  ref_embeddings: jax.Array) -> jax.Array:
    """CAM of retrieval similarity: which image regions drive
    cos(embed(image), retrieved_embedding) — saliency on retrieved pairs
    (BASELINE.json config #5)."""

    def target(fm):
        emb = get_fm(fm)
        return cosine_similarity(emb, ref_embeddings)

    return grad_cam(backbone, variables, images, target)
