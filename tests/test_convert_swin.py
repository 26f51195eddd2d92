"""Swin converter numerical parity vs an in-test torch replica (timm naming).

Covers: patch embed, window attention with relative position bias, shifted
windows (cyclic roll + mask), patch merging, final norm, pooled head.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import convert_torch_state_dict

WS = 7


def window_partition_t(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse_t(x, ws, h, w):
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.view(b, h // ws, w // ws, ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, num_heads, ws):
        super().__init__()
        self.num_heads, self.ws = num_heads, ws
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
            n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, res, num_heads, shift):
        super().__init__()
        self.res, self.shift = res, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, num_heads, WS)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        if shift > 0:
            h, w = res, res
            img = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -WS), slice(-WS, -shift),
                       slice(-shift, None)):
                for wsl in (slice(0, -WS), slice(-WS, -shift),
                            slice(-shift, None)):
                    img[:, hs, wsl] = cnt
                    cnt += 1
            mw = window_partition_t(img, WS).squeeze(-1)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(
                mask == 0, 0.0)
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        h = w = self.res
        b, l, c = x.shape
        sc = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        wins = window_partition_t(x, WS)
        wins = self.attn(wins, self.attn_mask)
        x = window_reverse_t(wins, WS, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = sc + x.view(b, l, c)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(
            self.norm2(x))))
        return x + y


class TorchPatchMerging(nn.Module):
    def __init__(self, dim, res):
        super().__init__()
        self.res = res
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        h = w = self.res
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class TorchSwin(nn.Module):
    """timm-named Swin: embed_dim 24, depths (2, 2), heads (2, 4), 56px."""

    def __init__(self, num_classes=5):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, 24, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(24)
        layers = nn.ModuleList()
        dims, res = (24, 48), (14, 7)
        heads = (2, 4)
        for s in range(2):
            stage = nn.Module()
            stage.blocks = nn.ModuleList()
            for bidx in range(2):
                # stage 1 is 7x7 = global window -> no shift (timm clamps)
                shift = WS // 2 if (bidx % 2 == 1 and res[s] > WS) else 0
                stage.blocks.append(
                    TorchSwinBlock(dims[s], res[s], heads[s], shift))
            if s == 0:
                stage.downsample = TorchPatchMerging(dims[s], res[s])
            layers.append(stage)
        self.layers = layers
        self.norm = nn.LayerNorm(48)
        self.head = nn.Linear(48, num_classes)

    def forward_features(self, x):
        x = self.patch_embed.proj(x)
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for s, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return self.norm(x)

    def forward(self, x):
        return self.head(self.forward_features(x).mean(1))


class TestSwinParity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(3)
        tmodel = TorchSwin(num_classes=5).eval()
        bb = create_model("swin_tiny_patch4_window7_224", num_classes=5,
                          img_size=56, embed_dim=24, depths=(2, 2),
                          num_heads=(2, 4), window_sizes=(7, 7),
                          drop_path_rate=0.0)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        return tmodel, bb, variables

    def test_forward_features_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            tf = tmodel.forward_features(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        of = np.asarray(bb.forward_features(variables, jnp.asarray(x)))
        np.testing.assert_allclose(of, tf, rtol=1e-4, atol=1e-4)

    def test_logits_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-4, atol=1e-4)
