"""Global average pooling — the reference's ``get_fm``.

reference train/train.py:84-103::

    pool = AvgPool2d((fm.shape[2], fm.shape[3]))
    return torch.reshape(pool(fm), (-1, fm.shape[1]))

i.e. mean over the spatial dims of a (B, C, H, W) feature map -> (B, C).
Our feature maps are NHWC (TPU-native layout), so we reduce axes (1, 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_fm(fm: jax.Array) -> jax.Array:
    """(B, H, W, C) or (B, L, C) feature map -> (B, C) by spatial mean.

    The (B, L, C) form covers transformer backbones (Swin token grids),
    matching the reference's pooling of the 4D map after reshape.
    Already-pooled (B, C) inputs pass through unchanged.
    """
    if fm.ndim == 4:
        return jnp.mean(fm, axis=(1, 2))
    if fm.ndim == 3:
        return jnp.mean(fm, axis=1)
    if fm.ndim == 2:
        return fm
    raise ValueError(f"expected 2-4D feature map, got shape {fm.shape}")
