"""Fast (non-slow) published-checkpoint ingestion drill (VERDICT r4 #5).

The full-size byte-realistic drill (tests/test_published_e2e.py) is
slow-marked and the routine suite runs ``-m "not slow"`` — so the
Lightning-``.ckpt`` ingestion path could silently rot between rounds.
This file runs the SAME on-disk layout (torch.save zip serialization,
``model.``-prefixed state dict, full buffer set, PL 1.6.4 metadata,
full-Trainer optimizer/scheduler/callback states — via the same
tools/make_published_ckpt.py builder) through the same
``models.convert.load_checkpoint`` ingestion the inference CLI uses
(reference prefix-strip load, inference/inference.py:114-124), on a
shrunken-width replica so it fits the default chunks (<60 s on this
1-core host).

What the full-size drill covers that this cannot: the published tensor
SIZES. What both cover: the zip layout, prefix stripping, tolerance of
the extra Trainer keys, strict key mapping, and torch↔Flax forward
equality on the round-tripped weights.
"""

import numpy as np
import pytest
import torch

INPUT = 32
CLASSES = 11
W, D = 0.5, 0.1   # the suite-standard shrunken-backbone mults (CLAUDE.md)


@pytest.fixture(scope="module")
def drill(tmp_path_factory):
    """Shrunken replica -> byte-realistic full-Trainer-layout .ckpt."""
    from test_convert import _randomize_bn_stats
    from test_convert_fullsize import TorchEffNet
    from tools.make_published_ckpt import make_lightning_ckpt

    tmodel = TorchEffNet(width_mult=W, depth_mult=D, num_classes=CLASSES)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, np.random.default_rng(5))
    path = str(tmp_path_factory.mktemp("ck") / "efficientnet_b0_small.ckpt")
    # weights_only=False = the FULL Trainer layout: optimizer_states /
    # lr_schedulers / callbacks present, which the loader must tolerate
    make_lightning_ckpt("efficientnet_b0", path, num_classes=CLASSES,
                        seed=2, weights_only=False, model=tmodel)
    tmodel.eval()
    return tmodel, path


def test_lightning_zip_layout(drill):
    """The artifact is a real torch.save ZIP with PL metadata intact."""
    import zipfile

    tmodel, path = drill
    assert zipfile.is_zipfile(path)   # torch.save zip serialization
    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["pytorch-lightning_version"] == "1.6.4"
    assert all(k.startswith("model.") for k in payload["state_dict"])
    # full Trainer layout: the extra keys the loader must tolerate
    assert "optimizer_states" in payload and "lr_schedulers" in payload
    st = payload["optimizer_states"][0]["state"]
    assert len(st) > 0 and "exp_avg" in next(iter(st.values()))
    # real optimizer steps moved the BN running stats (train-mode forward)
    bn_mean = payload["state_dict"]["model.bn1.running_mean"]
    assert not torch.allclose(bn_mean, torch.zeros_like(bn_mean))


def test_ingest_strict_and_forward_parity(drill):
    """load_checkpoint (the CLI's ingestion fn) strict-converts the ckpt
    and the Flax forward matches the torch replica."""
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint

    tmodel, path = drill
    bb = create_model("efficientnet_b0", num_classes=CLASSES,
                      width_mult=W, depth_mult=D)
    variables = load_checkpoint(path, bb,
                                sample_shape=(1, INPUT, INPUT, 3),
                                strict=True)

    x = np.random.default_rng(0).random(
        (2, INPUT, INPUT, 3)).astype(np.float32)
    with torch.no_grad():
        tlogits = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    flogits = np.asarray(bb(variables, jnp.asarray(x)))
    np.testing.assert_allclose(flogits, tlogits, rtol=1e-3, atol=1e-3)


def test_reverse_export_round_trip(drill):
    """Reverse converter: Flax -> Lightning-shaped state dict loads back
    into a fresh torch replica with strict=True."""
    from test_convert_fullsize import TorchEffNet

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import (
        export_torch_state_dict,
        load_checkpoint,
        strip_model_prefix,
    )

    tmodel, path = drill
    bb = create_model("efficientnet_b0", num_classes=CLASSES,
                      width_mult=W, depth_mult=D)
    variables = load_checkpoint(path, bb,
                                sample_shape=(1, INPUT, INPUT, 3),
                                strict=True)
    sd = export_torch_state_dict(bb, variables, lightning=True,
                                 template=tmodel.state_dict())
    fresh = TorchEffNet(width_mult=W, depth_mult=D, num_classes=CLASSES)
    fresh.load_state_dict(strip_model_prefix(sd), strict=True)
    for k, v in fresh.state_dict().items():
        torch.testing.assert_close(v, tmodel.state_dict()[k],
                                    rtol=1e-6, atol=1e-6)
