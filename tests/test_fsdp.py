"""FSDP (ZeRO-3 param+optimizer sharding) tests on the 8-device virtual CPU
mesh: spec selection, per-device memory, train-step equivalence vs the
replicated DP path, and layout stability across steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.parallel import (
    constrain_fsdp,
    fsdp_sharding,
    fsdp_spec,
    make_mesh,
    put_fsdp,
    put_replicated,
    replicate,
    shard_batch,
)
from imageretrievalresearch_tpu.train import (
    EmbedTrainState,
    build_train_step,
    make_optimizer,
)


class TestFsdpSpec:
    def test_small_leaf_replicated(self):
        assert fsdp_spec((64,), 8) == P()

    def test_no_divisible_dim_replicated(self):
        assert fsdp_spec((9001, 3), 8, min_elems=1) == P()

    def test_picks_largest_divisible_dim(self):
        assert fsdp_spec((16, 4096), 8, min_elems=1) == P(None, "data")
        assert fsdp_spec((4096, 16), 8, min_elems=1) == P("data", None)

    def test_tie_prefers_trailing_dim(self):
        # conv-kernel-style HWIO with I == O: shard the out-features dim
        assert fsdp_spec((3, 3, 256, 256), 8, min_elems=1) == \
            P(None, None, None, "data")

    def test_indivisible_large_dim_skipped_for_divisible(self):
        # largest dim (999) not divisible; 256 is → shard dim 1
        assert fsdp_spec((999, 256), 8, min_elems=1) == P(None, "data")

    def test_scalar_replicated(self):
        assert fsdp_spec((), 8) == P()


class TestFsdpPlacement:
    def test_per_device_bytes_are_fraction(self):
        mesh = make_mesh(8)
        x = np.arange(8 * 1024, dtype=np.float32).reshape(8, 1024)
        arr = jax.tree.leaves(put_fsdp(mesh, {"w": x}, min_elems=1))[0]
        shard = arr.addressable_shards[0]
        # both dims divide 8; the larger (1024) is sharded
        assert shard.data.shape == (8, 128)
        assert shard.data.nbytes == x.nbytes // 8
        np.testing.assert_array_equal(np.asarray(arr), x)

    def test_state_large_leaves_sharded_small_replicated(self):
        mesh = make_mesh(8)
        cfg, bb, state = _setup()
        sharded = put_fsdp(mesh, state)
        shardings = jax.tree.leaves(fsdp_sharding(mesh, state))
        leaves = jax.tree.leaves(sharded)
        n_sharded = 0
        for leaf, sh in zip(leaves, shardings):
            assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
            if sh.spec != P():
                n_sharded += 1
                assert leaf.addressable_shards[0].data.size == leaf.size // 8
        # the shrunken b0 still has several >=8192-element divisible leaves
        # (params + their two Adam moments)
        assert n_sharded >= 3

    def test_constrain_inside_jit_keeps_layout(self):
        mesh = make_mesh(8)
        x = np.ones((16, 4096), np.float32)
        placed = put_fsdp(mesh, x, min_elems=1)

        @jax.jit
        def step(v):
            return constrain_fsdp(mesh, v * 2.0, min_elems=1)

        out = step(placed)
        assert out.sharding.is_equivalent_to(
            NamedSharding(mesh, P(None, "data")), out.ndim)


def _setup(num_classes=4, optimizer="Adam"):
    cfg = TrainConfig(model_name="efficientnet_b0", image_size=32,
                      compute_dtype="float32")
    bb = create_model(cfg.model_name, num_classes=num_classes,
                      depth_mult=0.1, width_mult=0.5)
    variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    tx = make_optimizer(optimizer, 1e-2 if optimizer == "SGD" else 1e-3,
                        0.0 if optimizer == "SGD" else 1e-5)
    state = EmbedTrainState.from_backbone(bb, variables, tx)
    return cfg, bb, state


def _batch(rng, b=16, s=32):
    return {
        "qry": rng.random((b, s, s, 3)).astype(np.float32),
        "pos": [rng.random((b, s, s, 3)).astype(np.float32)],
        "neg": [rng.random((b, s, s, 3)).astype(np.float32)],
        "cat_idx": rng.integers(0, 4, b).astype(np.int32),
        "prod_idx": rng.integers(0, 4, b).astype(np.int32),
    }


class TestFsdpTrainStep:
    def test_fsdp8_matches_replicated(self, rng):
        """The ZeRO equivalence property: an FSDP-sharded step computes the
        same loss and the same parameter update as the replicated DP step
        (GSPMD all-gathers params where consumed; the update stays sharded).

        SGD so the update is LINEAR in the gradient: Adam's first step is
        ~lr*sign(g), which amplifies float-level reduction-order noise on
        near-zero gradients into full-magnitude sign flips — that would test
        the optimizer's conditioning, not the sharding."""
        cfg, bb, state = _setup(optimizer="SGD")
        base = build_train_step(bb, cfg)
        batch = _batch(rng, b=16)
        mesh = make_mesh(8)

        def fsdp_step(s, b, k):
            new_s, m = base(s, b, k)
            return constrain_fsdp(mesh, new_s), m

        state_f = put_fsdp(mesh, state)
        new_f, m_f = jax.jit(fsdp_step)(state_f, shard_batch(mesh, batch),
                                        jax.random.key(1))

        state_r = jax.device_put(state, replicate(mesh))
        new_r, m_r = jax.jit(base)(state_r, shard_batch(mesh, batch),
                                   jax.random.key(1))

        assert float(m_f["train_loss"]) == pytest.approx(
            float(m_r["train_loss"]), rel=1e-4)
        for wf, wr in zip(jax.tree.leaves(new_f.params),
                          jax.tree.leaves(new_r.params)):
            np.testing.assert_allclose(np.asarray(wf), np.asarray(wr),
                                       rtol=1e-3, atol=1e-6)
        # the memory property: updated large params are still sharded
        stays = [w for w in jax.tree.leaves(new_f.params)
                 if fsdp_spec(w.shape, 8) != P()]
        assert stays, "shrunken model lost all shardable leaves?"
        for w in stays:
            assert w.addressable_shards[0].data.size == w.size // 8, (
                f"{w.shape} came back unsharded")

    def test_trainer_integration(self, tmp_path, rng):
        """A Trainer(param_sharding='fsdp') init_state is sharded and its
        fused step runs; resume re-places the restored state sharded."""
        from imageretrievalresearch_tpu.train import Trainer

        class Loader:
            def __init__(self, rng):
                self.batches = [_batch(rng, b=8) for _ in range(2)]

            def __len__(self):
                return len(self.batches)

            def __iter__(self):
                return iter(self.batches)

            def set_epoch(self, e):
                pass

        cfg = TrainConfig(model_name="efficientnet_b0", image_size=32,
                          compute_dtype="float32", batch_size=8,
                          param_sharding="fsdp", max_epochs=1,
                          checkpoint_dir=str(tmp_path / "ckpt"))
        bb = create_model(cfg.model_name, num_classes=4,
                          depth_mult=0.1, width_mult=0.5)
        # identity transform: the loader already yields float batches
        tr = Trainer(cfg, bb, Loader(rng), mesh=make_mesh(8),
                     transform=lambda b, k: b)
        state = tr.init_state()
        big = [w for w in jax.tree.leaves(state.params)
               if fsdp_spec(w.shape, 8) != P()]
        assert big and all(
            w.addressable_shards[0].data.size == w.size // 8 for w in big)
        state, hist = tr.fit(state, max_epochs=1)
        assert np.isfinite(hist["epochs"][0]["train_loss"])
        # checkpoint written from the sharded state; resume restores sharded
        state2, _ = tr.fit(resume=True, max_epochs=1)
        big2 = [w for w in jax.tree.leaves(state2.params)
                if fsdp_spec(w.shape, 8) != P()]
        assert big2 and all(
            w.addressable_shards[0].data.size == w.size // 8 for w in big2)

    def test_hybrid_2d_mesh_dp_x_weight_sharding(self, rng):
        """Hybrid 2D layout on a (data=4, model=2) mesh: batch sharded over
        'data', params + optimizer sharded over 'model'. GSPMD all-gathers
        weights over 'model' where consumed and derives the gradient
        all-reduce over 'data'; one step matches the single-device result.

        Runs on a DENSE backbone (swin): grouped-conv families are excluded
        from model-axis sharding because XLA 0.9.0 mis-scales their kernel
        gradients on 2D meshes (see TestGroupedConv2DMeshCanary and
        parallel/fsdp.py::GROUPED_CONV_FAMILIES)."""
        from imageretrievalresearch_tpu.parallel import check_model_axis_safety

        cfg = TrainConfig(model_name="swin_s3_tiny_224", image_size=64,
                          compute_dtype="float32")
        # shrunken per CLAUDE.md (2 blocks instead of 12): embed_dim stays
        # 96 so qkv kernels clear MIN_SHARD_ELEMS and actually shard
        bb = create_model(cfg.model_name, num_classes=4, img_size=64,
                          drop_path_rate=0.0, depths=(1, 1),
                          num_heads=(3, 6), window_sizes=(8, 8))
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        tx = make_optimizer("SGD", 1e-2, 0.0)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        base = build_train_step(bb, cfg)
        batch = _batch(rng, b=8, s=64)
        mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                      ("data", "model"))
        check_model_axis_safety(cfg.model_name, mesh2d)

        def hybrid_step(s, b, k):
            ns, m = base(s, b, k)
            return constrain_fsdp(mesh2d, ns, axis_name="model",
                                  model_name=cfg.model_name), m

        state_h = put_fsdp(mesh2d, state, axis_name="model",
                           model_name=cfg.model_name)
        big = [w for w in jax.tree.leaves(state_h.params)
               if fsdp_spec(w.shape, 2, axis_name="model") != P()]
        assert big, "nothing sharded on the model axis?"
        for w in big:    # replicated over data (4 copies), split over model
            assert w.addressable_shards[0].data.size == w.size // 2
        new_h, m_h = jax.jit(hybrid_step)(
            state_h, shard_batch(mesh2d, batch), jax.random.key(1))

        new_1, m_1 = jax.jit(base)(state, jax.tree.map(jnp.asarray, batch),
                                   jax.random.key(1))
        assert float(m_h["train_loss"]) == pytest.approx(
            float(m_1["train_loss"]), rel=1e-4)
        for wh, w1 in zip(jax.tree.leaves(new_h.params),
                          jax.tree.leaves(new_1.params)):
            np.testing.assert_allclose(np.asarray(wh), np.asarray(w1),
                                       rtol=1e-3, atol=1e-6)
        # layout held: updated model-axis shards stayed 1/2-size
        stays = [w for w in jax.tree.leaves(new_h.params)
                 if fsdp_spec(w.shape, 2, axis_name="model") != P()]
        assert stays and all(
            w.addressable_shards[0].data.size == w.size // 2 for w in stays)

    def test_model_axis_guard_rejects_grouped_conv_families(self):
        from imageretrievalresearch_tpu.parallel import check_model_axis_safety
        mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                      ("data", "model"))
        for name in ("efficientnet_b3a", "rexnet_150", "resnext50_32x4d"):
            with pytest.raises(NotImplementedError):
                check_model_axis_safety(name, mesh2d)
        # dense families pass; 1D meshes always pass
        check_model_axis_safety("swin_s3_tiny_224", mesh2d)
        check_model_axis_safety("resnet50", mesh2d)
        check_model_axis_safety("efficientnet_b0", make_mesh(8))
        # 1-wide model axis shards nothing — the ×axis_size bug is ×1
        mesh_deg = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                        ("data", "model"))
        check_model_axis_safety("efficientnet_b3a", mesh_deg)

    def test_put_fsdp_model_axis_requires_model_name(self):
        """The guard is wired into the sharding entry points themselves:
        hybrid (non-'data' axis) placement without model_name is refused,
        and grouped-conv families are refused by name."""
        mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                      ("data", "model"))
        tree = {"w": np.zeros((128, 128), np.float32)}
        with pytest.raises(ValueError, match="model_name"):
            put_fsdp(mesh2d, tree, axis_name="model")
        with pytest.raises(NotImplementedError, match="grouped-conv"):
            put_fsdp(mesh2d, tree, axis_name="model",
                     model_name="efficientnet_b3a")
        with pytest.raises(ValueError, match="model_name"):
            constrain_fsdp(mesh2d, tree, axis_name="model")
        # the 'data' axis and 1D meshes need no model_name (Trainer's paths)
        put_fsdp(mesh2d, tree, axis_name="data")
        put_fsdp(make_mesh(8), tree)


class TestGroupedConv2DMeshCanary:
    """Pins the XLA 0.9.0 GSPMD wrong-answer this repo guards against: on a
    2D (data, model) mesh, a grouped conv's KERNEL GRADIENT is multiplied by
    the model-axis size whenever the conv's input activations are replicated
    over that axis (correct on 1D meshes, and correct when the activation
    channel dim is actually sharded over 'model'). Strict xfail: if an XLA
    upgrade fixes the partitioner, this test starts passing and the strict
    marker fails the suite — signal to drop the guard in parallel/fsdp.py."""

    @staticmethod
    def _grad_ratio(kspec, xspec):
        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                    ("data", "model"))
        B, S, C = 8, 4, 16
        x = np.random.default_rng(0).random((B, S, S, C)).astype(np.float32)
        k = np.random.default_rng(1).random((3, 3, 1, C)).astype(np.float32)

        def loss(k_, x_):
            y = jax.lax.conv_general_dilated(
                x_, k_, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
            return jnp.sum(y ** 2)

        truth = np.asarray(jax.grad(loss)(jnp.asarray(k), jnp.asarray(x)))
        g = jax.jit(jax.grad(loss))(
            jax.device_put(k, NamedSharding(mesh, kspec)),
            jax.device_put(x, NamedSharding(mesh, xspec)))
        return float(np.median(np.asarray(g) / truth))

    @pytest.mark.xfail(
        strict=True,
        reason="XLA 0.9.0 GSPMD doubles grouped-conv kernel grads when the "
               "input is replicated over the 2-wide model axis; if this "
               "passes, XLA fixed it — remove GROUPED_CONV_FAMILIES guard")
    def test_replicated_model_axis_grad_is_correct(self):
        r = self._grad_ratio(P(), P("data", None, None, None))
        assert r == pytest.approx(1.0, rel=1e-4)

    def test_channel_sharded_model_axis_grad_is_correct(self):
        # the configuration hybrid FSDP actually produces for dense layers
        r = self._grad_ratio(P(None, None, None, "model"),
                             P("data", None, None, "model"))
        assert r == pytest.approx(1.0, rel=1e-4)

    def test_fsdp_rejects_multiprocess(self, monkeypatch):
        from imageretrievalresearch_tpu.train import Trainer
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        cfg = TrainConfig(param_sharding="fsdp")
        bb = create_model("efficientnet_b0", num_classes=4,
                          depth_mult=0.1, width_mult=0.5)
        with pytest.raises(NotImplementedError):
            Trainer(cfg, bb, train_loader=[], mesh=make_mesh(8))
