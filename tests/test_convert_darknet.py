"""DarkNet-53 converter numerical parity vs a literal torch replica using
modern-timm cspnet naming (stem.conv1.*, stages.N.conv_down / blocks.M.conv{1,2},
head.fc) — the reference CLI's other example model name
("ex. darknet53, ig_resnext101_32x32d", train/train.py:488)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model, list_models
from imageretrievalresearch_tpu.models.convert import convert_torch_state_dict


class ConvBnAct(nn.Module):
    def __init__(self, in_chs, out_chs, kernel, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(in_chs, out_chs, kernel, stride,
                              kernel // 2, bias=False)
        self.bn = nn.BatchNorm2d(out_chs)

    def forward(self, x):
        return nn.functional.leaky_relu(self.bn(self.conv(x)), 0.1)


class TorchDarkBlock(nn.Module):
    def __init__(self, chs):
        super().__init__()
        self.conv1 = ConvBnAct(chs, chs // 2, 1)
        self.conv2 = ConvBnAct(chs // 2, chs, 3)

    def forward(self, x):
        return x + self.conv2(self.conv1(x))


class TorchDarkNet(nn.Module):
    def __init__(self, depths=(1, 1), num_classes=5):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv1 = ConvBnAct(3, 32, 3)
        self.stages = nn.ModuleList()
        in_chs = 32
        for s, depth in enumerate(depths):
            chs = 64 * 2 ** s
            stage = nn.Module()
            stage.conv_down = ConvBnAct(in_chs, chs, 3, 2)
            stage.blocks = nn.ModuleList(TorchDarkBlock(chs)
                                         for _ in range(depth))
            self.stages.append(stage)
            in_chs = chs
        self.head = nn.Module()
        self.head.fc = nn.Linear(in_chs, num_classes)

    def forward_features(self, x):
        x = self.stem.conv1(x)
        for stage in self.stages:
            x = stage.conv_down(x)
            for blk in stage.blocks:
                x = blk(x)
        return x

    def forward(self, x):
        return self.head.fc(self.forward_features(x).mean((2, 3)))


class TestDarkNetParity:
    def test_forward_parity(self, rng):
        torch.manual_seed(0)
        tmodel = TorchDarkNet(depths=(1, 2)).eval()
        with torch.no_grad():
            for mm in tmodel.modules():
                if isinstance(mm, nn.BatchNorm2d):
                    mm.running_mean.normal_(0, 0.2)
                    mm.running_var.uniform_(0.6, 1.4)
        bb = create_model("darknet53", num_classes=5, depths=(1, 2))
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-4, atol=1e-4)

    def test_full_size_key_map_covers_synthetic_state_dict(self):
        """Every key of a full darknet53 state dict maps, strictly."""
        torch.manual_seed(1)
        depths = (1, 2, 8, 8, 4)
        tmodel = TorchDarkNet(depths=depths, num_classes=7)
        bb = create_model("darknet53", num_classes=7)
        var_shapes = jax.eval_shape(
            lambda r: bb.init(r, jnp.zeros((1, 32, 32, 3))),
            jax.random.key(0))
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 var_shapes)
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        # spot-check a deep mapped weight actually landed
        w = variables["net"]["params"]["forward_features"][
            "stage3_block7"]["conv2"]["kernel"]
        tw = tmodel.stages[3].blocks[7].conv2.conv.weight.detach().numpy()
        np.testing.assert_allclose(np.asarray(w),
                                   tw.transpose(2, 3, 1, 0), rtol=1e-6)

    def test_registry_and_embed_mode(self):
        assert "darknet53" in list_models()
        bb = create_model("darknet53", num_classes=0, depths=(1, 1),
                          embed_only=True)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        emb = bb.embed(variables, jnp.zeros((2, 32, 32, 3)))
        assert emb.shape == (2, 128)
