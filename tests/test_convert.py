"""Weight-converter tests, including true numerical parity:

A torch replica of timm's EfficientNet-B0 (identical module naming and
arithmetic: Conv2d(padding=k//2), BN eps 1e-5, SiLU, SE on block input
channels) is built in-test, its state dict converted through our mapper,
and the Flax forward compared against the torch forward — the "bitwise-close
embeddings" requirement (SURVEY.md hard part #1) validated end-to-end
without needing timm installed.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import (
    convert_torch_state_dict,
    load_checkpoint,
    strip_model_prefix,
)
from imageretrievalresearch_tpu.models.efficientnet import _B0_STAGES
from imageretrievalresearch_tpu.models.layers import make_divisible


# --- torch replica of timm EfficientNet-B0 (naming-exact) ---

class TorchSE(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1, bias=True)
        self.act1 = nn.SiLU()
        self.conv_expand = nn.Conv2d(rd, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TorchDSBlock(nn.Module):
    """timm DepthwiseSeparableConv (stage 0): conv_dw/bn1 -> se -> conv_pw/bn2."""

    def __init__(self, in_chs, out_chs, k, s):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_chs, in_chs, k, s, k // 2,
                                 groups=in_chs, bias=False)
        self.bn1 = nn.BatchNorm2d(in_chs)
        self.act1 = nn.SiLU()
        self.se = TorchSE(in_chs, max(1, int(in_chs * 0.25)))
        self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs)
        self.has_residual = s == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        x = self.act1(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        return x + sc if self.has_residual else x


class TorchIRBlock(nn.Module):
    """timm InvertedResidual: conv_pw/bn1 -> conv_dw/bn2 -> se -> conv_pwl/bn3."""

    def __init__(self, in_chs, out_chs, k, s, e):
        super().__init__()
        mid = make_divisible(in_chs * e)
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.act1 = nn.SiLU()
        self.conv_dw = nn.Conv2d(mid, mid, k, s, k // 2, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.act2 = nn.SiLU()
        self.se = TorchSE(mid, max(1, int(in_chs * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_chs)
        self.has_residual = s == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        x = self.act1(self.bn1(self.conv_pw(x)))
        x = self.act2(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + sc if self.has_residual else x


class TorchEffNetB0(nn.Module):
    def __init__(self, num_classes=7):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.act1 = nn.SiLU()
        blocks = []
        in_chs = 32
        for (k, c, r, s, e) in _B0_STAGES:
            stage = []
            out = make_divisible(c)
            for i in range(r):
                stride = s if i == 0 else 1
                if e == 1:
                    stage.append(TorchDSBlock(in_chs, out, k, stride))
                else:
                    stage.append(TorchIRBlock(in_chs, out, k, stride, e))
                in_chs = out
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)
        self.conv_head = nn.Conv2d(in_chs, 1280, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(1280)
        self.act2 = nn.SiLU()
        self.classifier = nn.Linear(1280, num_classes)

    def forward_features(self, x):
        x = self.act1(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        return self.act2(self.bn2(self.conv_head(x)))

    def forward(self, x):
        x = self.forward_features(x).mean((2, 3))
        return self.classifier(x)


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so conversion of mean/var is exercised."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.8, 1.2, m.weight.shape).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(0, 0.1, m.bias.shape).astype(np.float32)))


class TestEfficientNetParity:
    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(0)
        tmodel = TorchEffNetB0(num_classes=7).eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, np.random.default_rng(3))
        bb = create_model("efficientnet_b0", num_classes=7)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=False)
        return tmodel, bb, variables

    def test_strict_conversion_covers_all_torch_keys(self, pair):
        # raw state dict, num_batches_tracked buffers included: the
        # converter must filter non-parameter buffers itself (real torch /
        # Lightning checkpoints always carry them)
        tmodel, bb, _ = pair
        variables = bb.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
        convert_torch_state_dict(tmodel.state_dict(), bb, variables,
                                 strict=True)

    def test_forward_features_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tfm = tmodel.forward_features(
                torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ffm = bb.forward_features(variables, jnp.asarray(x))
        ours = np.asarray(ffm).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, tfm.numpy(), rtol=1e-4, atol=1e-4)

    def test_logits_parity(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tl = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ol = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ol, tl, rtol=1e-4, atol=1e-4)

    def test_lightning_prefix_strip_roundtrip(self, pair, tmp_path, rng):
        tmodel, bb, variables = pair
        sd = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
        ckpt_path = str(tmp_path / "epoch=1-val_loss=0.1.ckpt")
        torch.save({"state_dict": sd}, ckpt_path)
        loaded = load_checkpoint(ckpt_path, bb, sample_shape=(1, 64, 64, 3))
        x = rng.random((1, 64, 64, 3)).astype(np.float32)
        a = np.asarray(bb.embed(loaded, jnp.asarray(x)))
        b = np.asarray(bb.embed(variables, jnp.asarray(x)))
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestRexNetMapping:
    def test_mapping_covers_flax_tree(self):
        # structural: every mapped flax path exists with the right shape
        bb = create_model("rexnet_100", num_classes=5)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        from imageretrievalresearch_tpu.models.convert import rexnet_key_map
        mapping = rexnet_key_map(1.0, 1.0)
        params = variables["net"]["params"]
        stats = variables["net"]["batch_stats"]
        for tkey, (path, kind) in mapping.items():
            tree = stats if kind in ("bn_mean", "bn_var") else params
            node = tree
            for p in path:
                assert p in node, f"{tkey} -> {path} missing at {p}"
                node = node[p]


class TestPrefixStrip:
    def test_strip(self):
        sd = {"model.conv.weight": 1, "other": 2}
        out = strip_model_prefix(sd)
        assert "conv.weight" in out and "other" in out


class TestTorchExport:
    """export_torch_state_dict: the reverse converter (flax -> timm-naming
    torch state dict), so models trained here load in the reference's torch
    tooling (inference/inference.py:114-124)."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(0)
        tmodel = TorchEffNetB0(num_classes=7).eval()
        with torch.no_grad():
            _randomize_bn_stats(tmodel, np.random.default_rng(3))
        bb = create_model("efficientnet_b0", num_classes=7)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        return tmodel, bb, variables

    def test_export_reproduces_source_state_dict_exactly(self, pair):
        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )
        tmodel, bb, variables = pair
        sd = export_torch_state_dict(bb, variables)
        ref = tmodel.state_dict()
        assert set(sd) == set(ref)   # incl. synthesized num_batches_tracked
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(sd[k]), ref[k].numpy(),
                err_msg=f"round-trip mismatch at {k}")

    def test_strict_torch_load_with_template(self, pair, rng):
        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )
        tmodel, bb, variables = pair
        torch.manual_seed(7)
        fresh = TorchEffNetB0(num_classes=7).eval()
        sd = export_torch_state_dict(bb, variables,
                                     template=fresh.state_dict())
        fresh.load_state_dict(sd, strict=True)
        x = torch.from_numpy(
            rng.random((2, 64, 64, 3)).astype(np.float32).transpose(
                0, 3, 1, 2))
        with torch.no_grad():
            np.testing.assert_allclose(fresh(x).numpy(), tmodel(x).numpy(),
                                       rtol=1e-6, atol=1e-6)

    def test_lightning_export_reloads_here(self, pair, tmp_path, rng):
        """--to torch --lightning_out output loads back through
        load_checkpoint (same path a published ckpt takes)."""
        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )
        _, bb, variables = pair
        sd = export_torch_state_dict(bb, variables, lightning=True)
        assert all(k.startswith("model.") for k in sd)
        p = str(tmp_path / "exported.ckpt")
        torch.save({"state_dict": sd}, p)
        loaded = load_checkpoint(p, bb, sample_shape=(1, 64, 64, 3))
        x = rng.random((1, 64, 64, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(bb.embed(loaded, jnp.asarray(x))),
            np.asarray(bb.embed(variables, jnp.asarray(x))), rtol=1e-6)

    @pytest.mark.parametrize("name,kwargs", [
        ("rexnet_100", {}),                      # CBA + SE-with-norm + BN stats
        ("swin_s3_tiny_224", {"img_size": 64}),  # dense/LN/raw-bias-table kinds
    ])
    def test_generic_roundtrip_all_kinds(self, name, kwargs, rng):
        """flax values -> torch layout -> flax again, bit-identical, for
        families covering every mapping kind — without a torch module."""
        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )
        bb = create_model(name, num_classes=5, **kwargs)
        shapes = jax.eval_shape(
            lambda k: bb.init(k, jnp.zeros((1, 64, 64, 3))),
            jax.random.key(0))
        r = np.random.default_rng(11)
        variables = jax.tree.map(
            lambda s: r.normal(0, 0.1, s.shape).astype(np.float32), shapes)
        sd = export_torch_state_dict(bb, variables)
        zeros = jax.tree.map(np.zeros_like, variables)
        back = convert_torch_state_dict(sd, bb, zeros, strict=True)
        for a, b in zip(jax.tree.leaves(variables["net"]),
                        jax.tree.leaves(back["net"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestConvInputConversion:
    """conv_input checkpoints both ways: the reference wraps the model as
    nn.Sequential(Sequential(Conv2d(3,3,3x3,bias=False), SiLU), base)
    (inference/inference.py:101-105), so trained state dicts carry the stem
    at '0.0.weight' and timm keys under '1.'."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch.manual_seed(1)
        base = TorchEffNetB0(num_classes=7).eval()
        with torch.no_grad():
            _randomize_bn_stats(base, np.random.default_rng(5))
        stem = nn.Sequential(
            nn.Conv2d(3, 3, kernel_size=3, stride=1, padding=1, bias=False),
            nn.SiLU(inplace=True))
        tmodel = nn.Sequential(stem, base).eval()
        bb = create_model("efficientnet_b0", num_classes=7, conv_input=True)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        return tmodel, bb, variables

    def test_forward_parity_with_stem(self, pair, rng):
        tmodel, bb, variables = pair
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(bb(variables, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_export_reproduces_sequential_state_dict(self, pair):
        from imageretrievalresearch_tpu.models.convert import (
            export_torch_state_dict,
        )
        tmodel, bb, variables = pair
        sd = export_torch_state_dict(bb, variables)
        ref = tmodel.state_dict()
        assert set(sd) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(sd[k]), ref[k].numpy(),
                err_msg=f"conv_input round-trip mismatch at {k}")

    def test_strict_refuses_stemless_dict_into_conv_input_model(self):
        torch.manual_seed(2)
        base = TorchEffNetB0(num_classes=7).eval()
        bb = create_model("efficientnet_b0", num_classes=7, conv_input=True)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        with pytest.raises(ValueError, match="conv_input"):
            convert_torch_state_dict(base.state_dict(), bb, variables,
                                     strict=True)
        # lenient = the reference's strict=False behavior: base weights
        # load, the stem stays randomly initialized
        out = convert_torch_state_dict(base.state_dict(), bb, variables,
                                       strict=False)
        np.testing.assert_array_equal(
            np.asarray(out["stem"]["params"]["conv"]["kernel"]),
            np.asarray(variables["stem"]["params"]["conv"]["kernel"]))
