"""Backbone tests: shapes, jit-compilability, API surface, determinism.

Runs on tiny inputs (64px) to keep CPU compile times sane; full-size 224px
shape checks are marked slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageretrievalresearch_tpu.models import create_model, list_models
from imageretrievalresearch_tpu.models.rexnet import rexnet_block_cfg


def _tiny(name, **kw):
    return create_model(name, num_classes=7, **kw)


class TestRegistry:
    def test_known_models_registered(self):
        names = list_models()
        for required in ("efficientnet_b3a", "rexnet_150", "rexnet_200",
                         "swin_s3_base_224"):
            assert required in names

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError, match="Unknown model name"):
            create_model("resnot_50")


class TestRexNetConfig:
    def test_block_cfg_matches_timm_rule(self):
        cfg = rexnet_block_cfg(width_mult=1.0)
        assert len(cfg) == 16
        out_chs = [c for c, _, _, _ in cfg]
        # timm ramp: block i = round(16 + i * 180/16) — the published
        # rexnet_100 progression 16, 27, 38, ..., 174, 185
        assert out_chs == [16, 27, 38, 50, 61, 72, 84, 95, 106, 117, 128,
                           140, 151, 162, 174, 185]
        strides = [s for _, _, s, _ in cfg]
        assert strides.count(2) == 4
        exps = [e for _, e, _, _ in cfg]
        assert exps[0] == 1 and set(exps[1:]) == {6}
        ses = [se for _, _, _, se in cfg]
        assert ses[0] == 0.0 and ses[-1] > 0


class TestEfficientNetConfig:
    """Literal pins of the published timm efficientnet_b3(a) architecture.

    The round-3 bug (final stage carried 5 base repeats instead of 1) hid
    because converters/replicas/tests all derived from the same
    `_B0_STAGES` table and stayed self-consistently green. These assert
    against HARDCODED published values (timm Table-1 scaling of B0:
    repeats ceil(1.4*r), channels round_channels(c*1.2)) so a table
    regression cannot self-certify again."""

    # efficientnet_b3: 26 blocks over 7 stages (timm block_args for b3)
    B3_REPEATS = (2, 3, 3, 5, 5, 6, 2)
    B3_CHANNELS = (24, 32, 48, 96, 136, 232, 384)
    B0_REPEATS = (1, 2, 2, 3, 3, 4, 1)
    B0_CHANNELS = (16, 24, 40, 80, 112, 192, 320)

    @pytest.mark.parametrize("name,repeats,channels,stem,head", [
        ("efficientnet_b3a", B3_REPEATS, B3_CHANNELS, 40, 1536),
        ("efficientnet_b0", B0_REPEATS, B0_CHANNELS, 32, 1280),
    ])
    def test_stage_structure_matches_timm(self, name, repeats, channels,
                                          stem, head):
        bb = create_model(name, num_classes=7)
        shapes = jax.eval_shape(
            lambda r, x: bb.net.init(r, x, False), jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3), jnp.float32))
        params = shapes["params"]["forward_features"]
        block_keys = sorted(k for k in params if k.startswith("blocks_"))
        expected = sorted(f"blocks_{s}_{i}"
                          for s, r in enumerate(repeats) for i in range(r))
        assert block_keys == expected, (
            f"{name}: got {len(block_keys)} blocks, want {len(expected)}")
        for s, out in enumerate(channels):
            # conv_pwl is the projection conv; its kernel's last dim is the
            # stage output width
            last = params[f"blocks_{s}_{repeats[s] - 1}"]
            got = last["conv_pwl"]["conv"]["kernel"].shape[-1]
            assert got == out, (
                f"{name} stage {s}: width {got} != published {out}")
        assert params["conv_stem"]["conv"]["kernel"].shape[-1] == stem
        assert params["conv_head"]["conv"]["kernel"].shape[-1] == head


class TestTrainModeForward:
    def test_train_true_without_mutable_runs_on_bn_backbone(self, rng):
        """The public __call__/embed surface with train=True must not hit
        flax's ModifyScopeVariableError on BatchNorm backbones — batch-mode
        BN runs and the running-stat updates are discarded (capture them
        via features_and_logits(mutable=True))."""
        bb = _tiny("efficientnet_b0")
        x = jnp.asarray(rng.random((2, 64, 64, 3)), dtype=jnp.float32)
        variables = bb.init(jax.random.key(0), x)
        out = bb(variables, x, train=True,
                 rngs={"dropout": jax.random.key(1)})
        assert np.isfinite(np.asarray(out)).all()
        emb = bb.embed(variables, x, train=True,
                       rngs={"dropout": jax.random.key(1)})
        assert emb.shape == (2, bb.num_features)


class TestCNNBackbones:
    @pytest.mark.parametrize("name,feat", [
        ("efficientnet_b0", 1280),
        ("rexnet_100", 1280),
    ])
    def test_forward_shapes(self, name, feat):
        bb = _tiny(name)
        x = jnp.zeros((2, 64, 64, 3))
        variables = bb.init(jax.random.key(0), x)
        fm = bb.forward_features(variables, x)
        assert fm.shape == (2, 2, 2, feat)
        logits = bb.head(variables, fm)
        assert logits.shape == (2, 7)
        emb = bb.embed(variables, x)
        assert emb.shape == (2, feat)

    def test_b3a_width(self):
        bb = _tiny("efficientnet_b3a")
        assert bb.num_features == 1536

    def test_rexnet150_width(self):
        bb = _tiny("rexnet_150")
        assert bb.num_features == 1920

    def test_embed_only_head_is_identity_pool(self):
        bb = _tiny("efficientnet_b0", embed_only=True)
        x = jnp.ones((1, 64, 64, 3))
        variables = bb.init(jax.random.key(0), x)
        fm = bb.forward_features(variables, x)
        np.testing.assert_allclose(np.asarray(bb.head(variables, fm)),
                                   np.asarray(fm.mean(axis=(1, 2))))

    def test_conv_input_stem(self):
        bb = _tiny("efficientnet_b0", conv_input=True)
        x = jnp.ones((1, 64, 64, 3))
        variables = bb.init(jax.random.key(0), x)
        assert "stem" in variables
        emb = bb.embed(variables, x)
        assert emb.shape == (1, 1280)

    def test_jit_and_determinism(self):
        bb = _tiny("rexnet_100")
        x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                        dtype=jnp.float32)
        variables = bb.init(jax.random.key(0), x)
        f = jax.jit(lambda v, x: bb.embed(v, x))
        a, b = f(variables, x), f(variables, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_batch_stats_update_in_train_mode(self):
        bb = _tiny("efficientnet_b0")
        x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                        dtype=jnp.float32)
        variables = bb.init(jax.random.key(0), x)
        fm, updates = bb.forward_features(variables, x, train=True,
                                          mutable=True)
        assert "batch_stats" in updates
        new_vars = bb.merge_updates(variables, updates)
        old = jax.tree.leaves(variables["net"]["batch_stats"])
        new = jax.tree.leaves(new_vars["net"]["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestSwin:
    def test_forward_shapes_tiny(self):
        bb = create_model("swin_s3_tiny_224", num_classes=5, img_size=64,
                          drop_path_rate=0.0)
        x = jnp.zeros((2, 64, 64, 3))
        variables = bb.init(jax.random.key(0), x)
        fm = bb.forward_features(variables, x)
        # 64/4 = 16 tokens/side -> 3 mergings -> 2x2 = 4 tokens, 8x embed
        assert fm.shape == (2, 4, 96 * 8)
        assert bb.head(variables, fm).shape == (2, 5)

    def test_embed_only_swin(self):
        # the reference's head=Identity embedding mode
        # (train_vit_triplet.py:357)
        bb = create_model("swin_s3_tiny_224", num_classes=5, img_size=64,
                          embed_only=True, drop_path_rate=0.0)
        x = jnp.ones((1, 64, 64, 3))
        variables = bb.init(jax.random.key(0), x)
        out = bb(variables, x)
        assert out.shape == (1, 96 * 8)

    def test_shifted_window_changes_output(self):
        # sanity: blocks with shift produce different features than without
        bb = create_model("swin_tiny_patch4_window7_224", num_classes=0,
                          img_size=56, drop_path_rate=0.0)
        x = jnp.asarray(np.random.default_rng(1).random((1, 56, 56, 3)),
                        dtype=jnp.float32)
        variables = bb.init(jax.random.key(0), x)
        fm = bb.forward_features(variables, x)
        assert np.isfinite(np.asarray(fm)).all()


@pytest.mark.slow
class TestFullSize:
    def test_b3a_224(self):
        bb = create_model("efficientnet_b3a", num_classes=125)
        x = jnp.zeros((1, 224, 224, 3))
        variables = bb.init(jax.random.key(0), x)
        fm = bb.forward_features(variables, x)
        assert fm.shape == (1, 7, 7, 1536)
