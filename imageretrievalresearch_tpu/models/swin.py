"""Swin Transformer in Flax — the reference's ViT-family backbone.

The reference trains timm's ``swin_s3_base_224`` with the head replaced by
Identity for embedding-only output (train/train_vit_triplet.py:468, :357).
The S3 variants are Swin with per-stage window sizes, so the builder takes a
window size per stage.

Blocks: LN -> shifted-window MHSA (relative position bias) -> residual;
LN -> MLP(4x, GELU) -> residual; PatchMerging (concat 2x2 -> LN -> Linear)
between stages.

API note: timm 0.4.12's Swin ``forward_features`` returns *pooled* (B, C)
features; ours returns the normed token grid (B, L, C) for consistency with
the CNN backbones (``ops.get_fm`` pools (B, L, C) -> (B, C) identically).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from imageretrievalresearch_tpu.models.layers import DropPath
from imageretrievalresearch_tpu.ops.pooling import get_fm


def _rel_pos_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # (2, ws, ws)
    flat = coords.reshape(2, -1)                            # (2, ws*ws)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, hp: int, wp: int, ws: int,
                     shift: int) -> np.ndarray | None:
    """Static attention mask on the padded (hp, wp) grid: (nW, N, N) additive.

    Region ids follow the standard shifted-window partition; padded cells
    (row >= h or col >= w) get a unique id so real tokens never attend
    padding. Returns None when no mask is needed (no shift, no padding)."""
    if shift == 0 and hp == h and wp == w:
        return None
    img = np.zeros((hp, wp), dtype=np.int32)
    if shift > 0:
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img[hs, wsl] = cnt
                cnt += 1
    # padded cells: isolate each in its own region
    pad_id = 100 + np.arange(hp * wp).reshape(hp, wp)
    padded = np.zeros((hp, wp), dtype=bool)
    padded[h:, :] = True
    padded[:, w:] = True
    if shift > 0:
        padded = np.roll(padded, (-shift, -shift), axis=(0, 1))
    img = np.where(padded, pad_id, img)
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)                          # (nW, N)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None,
                 train: bool = False):
        bn, n, c = x.shape
        ws = self.window_size
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(bn, n, 3, self.num_heads, head_dim)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        attn = (q * (head_dim ** -0.5)) @ k.transpose(0, 1, 3, 2)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = _rel_pos_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, self.num_heads, n, n)
            attn = attn + jnp.asarray(mask)[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bn, self.num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bn, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int
    shift_size: int
    input_resolution: tuple[int, int]
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        b, l, c = x.shape
        ws, shift = self.window_size, self.shift_size
        # window never larger than resolution -> no shift at global attention
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        # pad to window multiples (no-op at canonical 224 resolutions);
        # pad tokens are masked out of attention below
        hp, wp = -(-h // ws) * ws, -(-w // ws) * ws
        if (hp, wp) != (h, w):
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(h, w, hp, wp, ws, shift)
        wins = window_partition(x, ws)
        wins = WindowAttention(self.num_heads, ws, dtype=self.dtype,
                               name="attn")(wins, mask, train)
        x = window_reverse(wins, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, l, c)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class PatchMerging(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, resolution: tuple[int, int], train: bool = False):
        h, w = resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:  # odd grid: pad bottom/right (no-op at 224)
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, -(-h // 2) * -(-w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_sizes: Sequence[int] = (7, 7, 7, 7)
    num_classes: int = 1000
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        fm = self.forward_features(x, train)
        return self.head(fm, train)

    @nn.compact_name_scope
    def forward_features(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=p, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_norm")(x)
        res = (h, w)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(1, total - 1)
               for i in range(total)]
        bidx = 0
        for sidx, depth in enumerate(self.depths):
            ws = self.window_sizes[sidx]
            for i in range(depth):
                shift = 0 if i % 2 == 0 else ws // 2
                x = SwinBlock(self.num_heads[sidx], ws, shift, res,
                              self.mlp_ratio, dpr[bidx], dtype=self.dtype,
                              name=f"layers_{sidx}_blocks_{i}")(x, train)
                bidx += 1
            if sidx < len(self.depths) - 1:
                x = PatchMerging(dtype=self.dtype,
                                 name=f"layers_{sidx}_downsample")(
                    x, res, train)
                res = (-(-res[0] // 2), -(-res[1] // 2))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

    @nn.compact_name_scope
    def head(self, fm, train: bool = False):
        x = get_fm(fm)     # (B, L, C) token mean — shared pooling helper
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


SWIN_CONFIGS = {
    "swin_tiny_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_sizes=(7, 7, 7, 7)),
    "swin_small_patch4_window7_224": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window_sizes=(7, 7, 7, 7)),
    "swin_base_patch4_window7_224": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window_sizes=(7, 7, 7, 7)),
    # S3 (AutoFormerV2-searched) variants: per-stage window sizes
    "swin_s3_tiny_224": dict(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_sizes=(7, 7, 14, 7)),
    "swin_s3_small_224": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window_sizes=(14, 14, 14, 7)),
    "swin_s3_base_224": dict(
        embed_dim=96, depths=(2, 2, 30, 2), num_heads=(3, 6, 12, 24),
        window_sizes=(7, 14, 14, 7)),
}
