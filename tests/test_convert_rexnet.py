"""RexNet converter numerical parity vs an in-test torch replica.

The replica mirrors timm's rexnet module naming and arithmetic
(LinearBottleneck with ConvBnAct conv_exp/conv_dw, SEWithNorm fc1/bn/fc2,
conv_pwl, partial-channel residual, ReLU6 after SE) so the converted Flax
forward must match the torch forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import convert_torch_state_dict
from imageretrievalresearch_tpu.models.layers import make_divisible
from imageretrievalresearch_tpu.models.rexnet import rexnet_block_cfg


class TorchConvBnAct(nn.Module):
    """timm ConvBnAct: .conv / .bn (+ optional act applied in forward)."""

    def __init__(self, in_chs, out_chs, k, s=1, groups=1, act="silu"):
        super().__init__()
        self.conv = nn.Conv2d(in_chs, out_chs, k, s, k // 2, groups=groups,
                              bias=False)
        self.bn = nn.BatchNorm2d(out_chs)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "silu":
            x = torch.nn.functional.silu(x)
        return x


class TorchSEWithNorm(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(chs, rd, 1, bias=True)
        self.bn = nn.BatchNorm2d(rd)
        self.fc2 = nn.Conv2d(rd, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.relu(self.bn(self.fc1(s)))
        s = self.fc2(s)
        return x * torch.sigmoid(s)


class TorchLinearBottleneck(nn.Module):
    def __init__(self, in_chs, out_chs, stride, exp_ratio, se_ratio):
        super().__init__()
        self.in_channels, self.out_channels = in_chs, out_chs
        self.use_shortcut = stride == 1 and in_chs <= out_chs
        if exp_ratio != 1:
            mid = make_divisible(round(in_chs * exp_ratio), divisor=1)
            self.conv_exp = TorchConvBnAct(in_chs, mid, 1, act="silu")
        else:
            mid = in_chs
            self.conv_exp = None
        self.conv_dw = TorchConvBnAct(mid, mid, 3, stride, groups=mid,
                                      act=None)
        self.se = (TorchSEWithNorm(mid, make_divisible(int(mid * se_ratio),
                                                       divisor=1))
                   if se_ratio > 0 else None)
        self.conv_pwl = TorchConvBnAct(mid, out_chs, 1, act=None)

    def forward(self, x):
        shortcut = x
        if self.conv_exp is not None:
            x = self.conv_exp(x)
        x = self.conv_dw(x)
        if self.se is not None:
            x = self.se(x)
        x = torch.nn.functional.relu6(x)
        x = self.conv_pwl(x)
        if self.use_shortcut:
            x = torch.cat(
                [x[:, :self.in_channels] + shortcut,
                 x[:, self.in_channels:]], dim=1)
        return x


class TorchRexNet(nn.Module):
    def __init__(self, width_mult=1.0, num_classes=5):
        super().__init__()
        stem_chs = make_divisible(round(32 * width_mult), divisor=1)
        self.stem = TorchConvBnAct(3, stem_chs, 3, 2, act="silu")
        feats = []
        in_chs = stem_chs
        for c, e, s, se in rexnet_block_cfg(width_mult):
            feats.append(TorchLinearBottleneck(in_chs, c, s, e, se))
            in_chs = c
        pen = make_divisible(1280 * width_mult, divisor=1)
        feats.append(TorchConvBnAct(in_chs, pen, 1, act="silu"))
        self.features = nn.Sequential(*feats)
        self.head = nn.Module()
        self.head.fc = nn.Linear(pen, num_classes)

    def forward_features(self, x):
        return self.features(self.stem(x))

    def forward(self, x):
        return self.head.fc(self.forward_features(x).mean((2, 3)))


class TestRexNetParity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(1)
        tmodel = TorchRexNet(width_mult=1.0, num_classes=5).eval()
        rng = np.random.default_rng(7)
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.copy_(torch.from_numpy(
                        rng.normal(0, 0.2, m.running_mean.shape)
                        .astype(np.float32)))
                    m.running_var.copy_(torch.from_numpy(
                        rng.uniform(0.6, 1.4, m.running_var.shape)
                        .astype(np.float32)))
        bb = create_model("rexnet_100", num_classes=5)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        return tmodel, bb, variables

    def test_forward_features_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tfm = tmodel.forward_features(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours = np.asarray(bb.forward_features(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), tfm.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_logits_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-4, atol=1e-4)
