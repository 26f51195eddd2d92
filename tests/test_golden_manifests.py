"""Frozen-manifest tests: the builders must reproduce tests/golden/*.

VERDICT r3 task 1a: the golden manifests are checked-in artifacts
(generated once by tools/gen_golden_manifests.py, hand-audited against
published parameter counts — see tests/golden/README.md). These tests
rebuild each published architecture's torch key->shape manifest from the
live builders (``key_map_for`` + ``jax.eval_shape``) and assert EXACT
equality with the frozen JSON, so any drift in the shared architecture
tables (models/efficientnet.py::_B0_STAGES, models/rexnet.py::
rexnet_block_cfg, models/swin.py::SWIN_CONFIGS, resnet/darknet layouts)
breaks a checked-in file instead of staying self-consistently green.

Reference anchors: timm==0.4.12 (/root/reference/requirements.txt:164),
timm.create_model (/root/reference/train/train.py:396), published
checkpoints (/root/reference/checkpoints/checkpoints_path.txt:1-6).
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# (model, init size, published parameter count — an independently published
# fact, NOT derived from this repo; see tests/golden/README.md audit trail)
CASES = [
    ("rexnet_150", 64, 9_728_593),
    ("rexnet_200", 64, 16_366_620),
    ("efficientnet_b0", 64, 5_288_548),
    ("efficientnet_b3a", 64, 12_233_232),
    ("swin_s3_tiny_224", 224, 28_328_674),
    ("swin_s3_small_224", 224, 49_737_298),
    ("swin_s3_base_224", 224, 71_132_482),
    ("resnet50", 64, 25_557_032),
    ("darknet53", 64, 41_609_928),
]

_BUFFER_MARKERS = ("running_mean", "running_var", "num_batches_tracked")


def _load_golden(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, f"{name}.keys.json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


@pytest.mark.parametrize("name,size,published_params",
                         [pytest.param(*c, id=c[0]) for c in CASES])
def test_builder_matches_frozen_manifest(name, size, published_params):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.gen_golden_manifests import torch_manifest

    golden = _load_golden(name)
    live = {k: tuple(v) for k, v in torch_manifest(name, size).items()}

    missing = sorted(set(golden) - set(live))
    extra = sorted(set(live) - set(golden))
    assert not missing and not extra, (
        f"{name}: builder drifted from frozen manifest — "
        f"missing={missing[:6]} extra={extra[:6]}")
    mismatched = {k: (live[k], golden[k]) for k in golden
                  if live[k] != golden[k]}
    assert not mismatched, f"{name}: shape drift {mismatched}"

    # belt and suspenders: parameters-only total equals the published count
    total = sum(_prod(s) for k, s in golden.items()
                if s and not any(m in k for m in _BUFFER_MARKERS))
    assert total == published_params, (
        f"{name}: manifest param total {total} != published "
        f"{published_params}")


def _prod(shape):
    out = 1
    for s in shape:
        out *= s
    return out
