"""Paper-literal architecture constants, written out by hand.

VERDICT r3 task 1b: these literals are transcribed from the PUBLISHED
architectures (EfficientNet paper Table 1; ReXNet paper / timm channel
ramp; AutoFormerV2 S3 search results) — deliberately NOT derived from
_B0_STAGES / rexnet_block_cfg / swin._CONFIGS. They pin the shared tables
from outside, so a table edit that stays self-consistent with the
builders/replicas/converters (the round-3 bug class) still fails here.

Reference anchors: /root/reference/train/train.py:396 (timm backbones),
train/train_efficientnet.py:540 (efficientnet_b3a default),
train/train_vit_triplet.py:468 (swin_s3_base_224), train/train.py:488
(rexnet_150 default).
"""


# --- EfficientNet-B0, paper Table 1 -----------------------------------
# (kernel, out_channels, repeats, stride, expand) per stage — written out
# from the published table: MBConv1 k3 16x1 s1; MBConv6 k3 24x2 s2;
# MBConv6 k5 40x2 s2; MBConv6 k3 80x3 s2; MBConv6 k5 112x3 s1;
# MBConv6 k5 192x4 s2; MBConv6 k3 320x1 s1.  16 blocks total.
B0_TABLE1 = (
    (3, 16, 1, 1, 1),
    (3, 24, 2, 2, 6),
    (5, 40, 2, 2, 6),
    (3, 80, 3, 2, 6),
    (5, 112, 3, 1, 6),
    (5, 192, 4, 2, 6),
    (3, 320, 1, 1, 6),
)

# --- RexNet channel ramps (round(base*w), base += 180/16) --------------
# rexnet_100's progression is the published one (final block 185).  The
# x1.5 / x2.0 lists are hand-computed from the same formula with Python
# banker's rounding (timm's `round`), NOT read from the repo tables.
REXNET_100_CHS = (16, 27, 38, 50, 61, 72, 84, 95, 106, 117,
                  128, 140, 151, 162, 174, 185)
REXNET_150_CHS = (24, 41, 58, 75, 92, 108, 125, 142, 159, 176,
                  193, 210, 226, 243, 260, 277)
REXNET_200_CHS = (32, 54, 77, 100, 122, 144, 167, 190, 212, 234,
                  257, 280, 302, 324, 347, 370)
REXNET_LAYERS = (1, 2, 2, 3, 3, 5)          # per-stage repeats
REXNET_STAGE_STRIDES = (1, 2, 2, 2, 1, 2)   # stride on each stage's first

# --- Swin S3 (AutoFormerV2 search results, modern-timm configs) --------
S3_CONFIGS = {
    "swin_s3_tiny_224": dict(embed_dim=96, depths=(2, 2, 6, 2),
                             num_heads=(3, 6, 12, 24),
                             window_sizes=(7, 7, 14, 7)),
    "swin_s3_small_224": dict(embed_dim=96, depths=(2, 2, 18, 2),
                              num_heads=(3, 6, 12, 24),
                              window_sizes=(14, 14, 14, 7)),
    "swin_s3_base_224": dict(embed_dim=96, depths=(2, 2, 30, 2),
                             num_heads=(3, 6, 12, 24),
                             window_sizes=(7, 14, 14, 7)),
}

# --- classic CNN layouts ------------------------------------------------
RESNET50_LAYERS = (3, 4, 6, 3)
DARKNET53_DEPTHS = (1, 2, 8, 8, 4)


class TestEfficientNetGroundTruth:
    def test_b0_stage_table_is_paper_table1(self):
        from imageretrievalresearch_tpu.models.efficientnet import _B0_STAGES
        assert tuple(_B0_STAGES) == B0_TABLE1

    def test_b0_has_16_blocks(self):
        assert sum(r for _, _, r, _, _ in B0_TABLE1) == 16

    def test_b3_scaling_literals(self):
        """b3: width 1.2 / depth 1.4 -> 26 blocks, stem 40, head 1536."""
        from imageretrievalresearch_tpu.models.efficientnet import (
            _round_repeats,
        )
        from imageretrievalresearch_tpu.models.layers import make_divisible
        assert sum(_round_repeats(r, 1.4) for _, _, r, _, _ in B0_TABLE1) == 26
        assert make_divisible(32 * 1.2) == 40
        assert make_divisible(1280 * 1.2) == 1536
        assert tuple(make_divisible(c * 1.2) for _, c, _, _, _
                     in B0_TABLE1) == (24, 32, 48, 96, 136, 232, 384)


class TestRexNetGroundTruth:
    def _chs(self, width):
        from imageretrievalresearch_tpu.models.rexnet import rexnet_block_cfg
        return tuple(c for c, _, _, _ in rexnet_block_cfg(width))

    def test_channel_ramps(self):
        assert self._chs(1.0) == REXNET_100_CHS
        assert self._chs(1.5) == REXNET_150_CHS
        assert self._chs(2.0) == REXNET_200_CHS

    def test_strides_and_expands(self):
        from imageretrievalresearch_tpu.models.rexnet import rexnet_block_cfg
        cfg = rexnet_block_cfg(1.5)
        assert len(cfg) == sum(REXNET_LAYERS)
        want_strides = []
        for s, n in zip(REXNET_STAGE_STRIDES, REXNET_LAYERS):
            want_strides += [s] + [1] * (n - 1)
        assert [s for _, _, s, _ in cfg] == want_strides
        # expand ratio 1 on the first block only, 6 elsewhere
        assert [e for _, e, _, _ in cfg] == [1] + [6] * 15
        # SE off for the first two stages (3 blocks), on after
        assert [se > 0 for _, _, _, se in cfg] == [False] * 3 + [True] * 13

    def test_feature_dims(self):
        from imageretrievalresearch_tpu.models import create_model
        assert create_model("rexnet_150").num_features == 1920
        assert create_model("rexnet_200").num_features == 2560


class TestSwinS3GroundTruth:
    def test_s3_configs_match_search_results(self):
        from imageretrievalresearch_tpu.models.swin import SWIN_CONFIGS
        for name, want in S3_CONFIGS.items():
            got = SWIN_CONFIGS[name]
            for k, v in want.items():
                got_v = tuple(got[k]) if isinstance(v, tuple) else got[k]
                assert got_v == v, (name, k, got_v, v)


class TestClassicCNNGroundTruth:
    def test_resnet50_layers(self):
        import json
        import os
        golden = json.load(open(os.path.join(
            os.path.dirname(__file__), "golden", "resnet50.keys.json")))
        for i, depth in enumerate(RESNET50_LAYERS, start=1):
            blocks = {k.split(".")[1] for k in golden
                      if k.startswith(f"layer{i}.")}
            assert blocks == {str(j) for j in range(depth)}
        assert tuple(golden["fc.weight"]) == (1000, 2048)

    def test_darknet53_depths(self):
        import json
        import os
        golden = json.load(open(os.path.join(
            os.path.dirname(__file__), "golden", "darknet53.keys.json")))
        for i, depth in enumerate(DARKNET53_DEPTHS):
            blocks = {k.split(".")[3] for k in golden
                      if k.startswith(f"stages.{i}.blocks.")}
            assert blocks == {str(j) for j in range(depth)}, (i, blocks)
