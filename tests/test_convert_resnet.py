"""ResNet/ResNeXt converter numerical parity vs torchvision-style replica
(timm/torchvision share Bottleneck naming for these)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model, list_models
from imageretrievalresearch_tpu.models.convert import convert_torch_state_dict


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):
    def __init__(self, layers=(2, 2), groups=1, base_width=64,
                 num_classes=5):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for sidx, blocks in enumerate(layers):
            planes = 64 * 2 ** sidx
            stage = []
            for i in range(blocks):
                stride = (1 if sidx == 0 else 2) if i == 0 else 1
                stage.append(TorchBottleneck(inplanes, planes, stride,
                                             groups, base_width))
                inplanes = planes * 4
            setattr(self, f"layer{sidx + 1}", nn.Sequential(*stage))
        self.num_layers = len(layers)
        self.fc = nn.Linear(inplanes, num_classes)

    def forward_features(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(self.num_layers):
            x = getattr(self, f"layer{s + 1}")(x)
        return x

    def forward(self, x):
        return self.fc(self.forward_features(x).mean((2, 3)))


class TestResNetParity:
    @pytest.mark.parametrize("groups,base_width", [(1, 64), (8, 4)])
    def test_forward_parity(self, rng, groups, base_width):
        torch.manual_seed(0)
        tmodel = TorchResNet(layers=(2, 2), groups=groups,
                             base_width=base_width).eval()
        with torch.no_grad():
            for mm in tmodel.modules():
                if isinstance(mm, nn.BatchNorm2d):
                    mm.running_mean.normal_(0, 0.2)
                    mm.running_var.uniform_(0.6, 1.4)
        bb = create_model("resnet50", num_classes=5, layers=(2, 2),
                          groups=groups, base_width=base_width)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-4, atol=1e-4)

    def test_registry_has_resnext(self):
        names = list_models()
        for n in ("resnet50", "resnext50_32x4d", "ig_resnext101_32x32d"):
            assert n in names
