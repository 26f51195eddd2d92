"""Generate golden torch state-dict manifests for the published backbones.

One-shot generator (VERDICT r3 task 1a): for each architecture the
reference trains or publishes checkpoints for
(/root/reference/checkpoints/checkpoints_path.txt:1-6,
/root/reference/train/train.py:396 timm.create_model), emit
``tests/golden/<model>.keys.json`` mapping every torch state-dict key the
timm model would carry to its torch-layout shape.

The manifests are generated FROM the corrected builders (via
``key_map_for`` + ``jax.eval_shape``) but are then FROZEN as checked-in
artifacts and hand-audited against the published architectures (see
tests/golden/README.md for the audit trail). From then on they are an
independent ground truth: any drift in the shared architecture tables
(models/efficientnet.py::_B0_STAGES, models/rexnet.py::rexnet_block_cfg,
models/swin.py::SWIN_CONFIGS) breaks tests/test_golden_manifests.py — the
round-3 self-consistent-drift bug class (builder + replica + converter
all reading one table) cannot recur silently.

Conventions:
- num_classes=1000 (timm-canonical head; only the classifier/head Linear
  depends on it — the reference retrains heads at 125 classes).
- torch layouts: conv (O, I/groups, kH, kW); linear (out, in); BN vectors
  (C,); ``num_batches_tracked`` scalars included for every BN (real timm
  state dicts carry them; the converter filters them).
- swin's ``relative_position_index`` / ``attn_mask`` buffers are NOT
  listed: they are deterministic functions of window size / resolution,
  recomputed at model build, and resolution-dependent — the converter
  filters them (models/convert.py::_NONPARAM_BUFFER_RE). Window sizes are
  still pinned, via the relative_position_bias_table shapes
  ((2*ws-1)^2, heads).

Run: python tools/gen_golden_manifests.py  (writes tests/golden/*.keys.json)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODELS = {
    # name -> init spatial size (param shapes are size-independent for the
    # CNNs; swin needs 224 for its stage grids)
    "rexnet_150": 64,
    "rexnet_200": 64,
    "efficientnet_b0": 64,
    "efficientnet_b3a": 64,
    "swin_s3_tiny_224": 224,
    "swin_s3_small_224": 224,
    "swin_s3_base_224": 224,
    "resnet50": 64,
    "darknet53": 64,
}


def torch_manifest(model_name: str, size: int, num_classes: int = 1000):
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import key_map_for

    bb = create_model(model_name, num_classes=num_classes)
    shapes = jax.eval_shape(
        lambda k: bb.init(k, jnp.zeros((1, size, size, 3))),
        jax.random.key(0))
    params = shapes["net"]["params"]
    stats = shapes["net"].get("batch_stats", {})
    manifest = {}
    for tkey, (path, kind) in key_map_for(bb).items():
        node = stats if kind in ("bn_mean", "bn_var") else params
        for p in path:
            node = node[p]
        s = tuple(node.shape)
        if kind == "conv":
            s = (s[3], s[2], s[0], s[1])
        elif kind == "linear":
            s = (s[1], s[0])
        manifest[tkey] = list(s)
        if kind == "bn_mean":
            # real timm BN state carries the bookkeeping scalar too
            nbt = tkey.replace("running_mean", "num_batches_tracked")
            manifest[nbt] = []
    return manifest


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, size in MODELS.items():
        manifest = torch_manifest(name, size)
        path = os.path.join(out_dir, f"{name}.keys.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
            f.write("\n")
        n_params = sum(1 for k in manifest
                       if not k.endswith("num_batches_tracked"))
        print(f"{name}: {len(manifest)} keys ({n_params} tensors) -> {path}")


if __name__ == "__main__":
    main()
