"""Full-size converter validation (round-2): strict conversion + one
forward for the published-checkpoint architectures — rexnet_150,
efficientnet_b3a, swin_s3_base_224 (checkpoints/checkpoints_path.txt:1-6,
inference/inference.py:114-124). Round 1 proved converter parity only at
B0 / shrunken sizes; these pin the full-size shape coverage (width
rounding, depth-multiplied repeat counts, the 30-block S3 stage).

All slow-marked: full-size CPU compiles take minutes on this host.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import (
    convert_torch_state_dict,
    key_map_for,
)
from imageretrievalresearch_tpu.models.efficientnet import (
    _B0_STAGES,
    _round_repeats,
)
from imageretrievalresearch_tpu.models.layers import make_divisible

from test_convert import TorchDSBlock, TorchIRBlock, _randomize_bn_stats
from test_convert_rexnet import TorchRexNet

pytestmark = pytest.mark.slow


class TorchEffNet(nn.Module):
    """Width/depth-scaled generalization of test_convert.TorchEffNetB0,
    following timm's scaling rules (round_channels on stem/stage/head,
    ceil on repeats)."""

    def __init__(self, width_mult=1.0, depth_mult=1.0, num_classes=7):
        super().__init__()
        stem = make_divisible(32 * width_mult)
        self.conv_stem = nn.Conv2d(3, stem, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem)
        self.act1 = nn.SiLU()
        blocks = []
        in_chs = stem
        for (k, c, r, s, e) in _B0_STAGES:
            stage = []
            out = make_divisible(c * width_mult)
            for i in range(_round_repeats(r, depth_mult)):
                stride = s if i == 0 else 1
                if e == 1:
                    stage.append(TorchDSBlock(in_chs, out, k, stride))
                else:
                    stage.append(TorchIRBlock(in_chs, out, k, stride, e))
                in_chs = out
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)
        head = make_divisible(1280 * width_mult)
        self.conv_head = nn.Conv2d(in_chs, head, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(head)
        self.act2 = nn.SiLU()
        self.classifier = nn.Linear(head, num_classes)

    def forward_features(self, x):
        x = self.act1(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        return self.act2(self.bn2(self.conv_head(x)))

    def forward(self, x):
        x = self.forward_features(x).mean((2, 3))
        return self.classifier(x)


class TestEfficientNetB3aFullSize:
    def test_strict_convert_and_forward_parity(self, rng):
        torch.manual_seed(0)
        tmodel = TorchEffNet(width_mult=1.2, depth_mult=1.4,
                             num_classes=125).eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, np.random.default_rng(3))
        bb = create_model("efficientnet_b3a", num_classes=125)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        # raw state dict incl. num_batches_tracked buffers: strict must pass
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        assert bb.num_features == 1536   # the b3a embedding dim
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-3, atol=1e-3)


class TestRexNet150FullSize:
    def test_strict_convert_and_forward_parity(self, rng):
        torch.manual_seed(1)
        tmodel = TorchRexNet(width_mult=1.5, num_classes=125).eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.2)
                    m.running_var.uniform_(0.6, 1.4)
        bb = create_model("rexnet_150", num_classes=125)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-3, atol=1e-3)


def _synth_state_dict(bb, variables, rng):
    """Synthesize a torch state dict with the torch-layout shapes implied
    by the key map (conv HWIO->OIHW, linear (in,out)->(out,in))."""
    mapping = key_map_for(bb)
    params = variables["net"]["params"]
    stats = variables["net"].get("batch_stats", {})
    sd = {}
    for tkey, (path, kind) in mapping.items():
        node = stats if kind in ("bn_mean", "bn_var") else params
        for p in path:
            node = node[p]
        shape = node.shape
        if kind == "conv":
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif kind == "linear":
            tshape = (shape[1], shape[0])
        else:
            tshape = shape
        sd[tkey] = torch.from_numpy(
            rng.normal(0, 0.05, tshape).astype(np.float32))
    return sd


class TestSwinS3BaseFullSize:
    def test_strict_convert_and_forward(self, rng):
        """swin_s3_base_224 at published size: embed 96, depths (2,2,30,2),
        per-stage windows (7,14,14,7). The state dict is synthesized from
        the key map (no timm in-image), plus the non-parameter buffers a
        real checkpoint carries, which the converter must filter."""
        bb = create_model("swin_s3_base_224", num_classes=125)
        shapes = jax.eval_shape(
            lambda k: bb.init(k, jnp.zeros((1, 224, 224, 3))),
            jax.random.key(0))
        variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                 shapes)
        sd = _synth_state_dict(bb, variables, rng)
        # buffers a real timm checkpoint always carries
        sd["layers.0.blocks.0.attn.relative_position_index"] = (
            torch.zeros((49, 49), dtype=torch.long))
        sd["layers.0.blocks.1.attn_mask"] = torch.zeros((64, 49, 49))
        variables = convert_torch_state_dict(sd, bb, variables, strict=True)
        x = jnp.asarray(rng.random((1, 224, 224, 3)).astype(np.float32))
        logits = np.asarray(bb(variables, x))
        assert logits.shape == (1, 125)
        assert np.isfinite(logits).all()
