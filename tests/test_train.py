"""Training-stack tests: optimizer/schedule parity, step mechanics, and a
tiny end-to-end fit on the synthetic Sketchy tree over an 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.data import SketchyImageDataset, TripletLoader
from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.train import (
    EmbedTrainState,
    Trainer,
    build_eval_step,
    build_train_step,
    make_optimizer,
    multistep_lr,
)


def _tiny_cfg(**kw):
    defaults = dict(model_name="efficientnet_b0", batch_size=8,
                    image_size=32, compute_dtype="float32",
                    max_epochs=1, num_workers=2, log_every_n_steps=1000)
    defaults.update(kw)
    return TrainConfig(**defaults)


def _fake_batch(rng, b=8, s=32, n_cls=4):
    return {
        "qry": jnp.asarray(rng.random((b, s, s, 3)), dtype=jnp.float32),
        "pos": [jnp.asarray(rng.random((b, s, s, 3)), dtype=jnp.float32)],
        "neg": [jnp.asarray(rng.random((b, s, s, 3)), dtype=jnp.float32)],
        "cat_idx": jnp.asarray(rng.integers(0, n_cls, b), dtype=jnp.int32),
        "prod_idx": jnp.asarray(rng.integers(0, n_cls, b), dtype=jnp.int32),
    }


class TestSchedule:
    def test_multistep_lr_matches_torch_rule(self):
        # MultiStepLR([6,12], 0.1): lr, ..., lr*0.1 from epoch 6, *0.01 from 12
        sched = multistep_lr(1.0, [6, 12], 0.1, steps_per_epoch=10)
        assert float(sched(0)) == 1.0
        assert float(sched(59)) == 1.0
        assert float(sched(60)) == pytest.approx(0.1)
        assert float(sched(119)) == pytest.approx(0.1)
        assert float(sched(120)) == pytest.approx(0.01)

    def test_adamw_matches_torch_one_step(self):
        import torch
        w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        g = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)
        # torch
        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.AdamW([tw], lr=1e-3, weight_decay=1e-5)
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        # ours
        tx = make_optimizer("Adam", 1e-3, 1e-5)
        state = tx.init({"w": jnp.asarray(w0)})
        upd, _ = tx.update({"w": jnp.asarray(g)}, state, {"w": jnp.asarray(w0)})
        ours = np.asarray(jnp.asarray(w0) + upd["w"])
        np.testing.assert_allclose(ours, tw.detach().numpy(), rtol=1e-5,
                                   atol=1e-7)

    def test_unknown_optimizer(self):
        with pytest.raises(ValueError, match="Unknown optimizer"):
            make_optimizer("Lion", 1e-3, 0.0)


class TestSteps:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = _tiny_cfg()
        bb = create_model(cfg.model_name, num_classes=4,
                          depth_mult=0.1, width_mult=0.5)
        sample = jnp.zeros((1, 32, 32, 3))
        variables = bb.init(jax.random.key(0), sample)
        tx = make_optimizer("Adam", 1e-3, 1e-5)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        return cfg, bb, state

    def test_train_step_updates_params_and_stats(self, setup, rng):
        cfg, bb, state = setup
        step = jax.jit(build_train_step(bb, cfg))
        batch = _fake_batch(rng)
        new_state, metrics = step(state, batch, jax.random.key(1))
        assert int(new_state.step) == int(state.step) + 1
        # params changed
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # bn stats changed
        sa = jax.tree.leaves(state.batch_stats)[0]
        sb = jax.tree.leaves(new_state.batch_stats)[0]
        assert not np.allclose(np.asarray(sa), np.asarray(sb))
        for k in ("train_loss", "train_top3", "train_top1"):
            assert np.isfinite(float(metrics[k]))

    def test_eval_step_reference_metric_keys(self, setup, rng):
        cfg, bb, state = setup
        step = jax.jit(build_eval_step(bb, cfg))
        metrics = step(state, _fake_batch(rng))
        for k in ("val_loss", "cos_sims", "cos_unsims", "val_top3",
                  "val_top1", "val_loss_cos_poss", "val_loss_cos_negs",
                  "val_loss_ce_ims", "val_loss_ce_poss"):
            assert k in metrics, k

    def test_loss_mode_cos_only(self, setup, rng):
        cfg, bb, state = setup
        cfg2 = _tiny_cfg(only_feature_embeddings=True,
                         only_target_labels=None, cos_margin=0.2)
        m = jax.jit(build_eval_step(bb, cfg2))(state, _fake_batch(rng))
        assert "val_loss_ce_ims" not in m
        assert "val_loss_cos_poss" in m

    def test_loss_mode_cos_con_ce(self, setup, rng):
        cfg, bb, state = setup
        cfg3 = _tiny_cfg(use_contrastive=True, cos_margin=0.3,
                         con_margin=0.3)
        m = jax.jit(build_eval_step(bb, cfg3))(state, _fake_batch(rng))
        assert "val_loss_con_poss" in m and "val_loss_ce_poss" in m
        total = (float(m["val_loss_cos_poss"]) + float(m["val_loss_cos_negs"])
                 + float(m["val_loss_con_poss"]) + float(m["val_loss_con_negs"])
                 + float(m["val_loss_ce_ims"]) + float(m["val_loss_ce_poss"]))
        assert float(m["val_loss"]) == pytest.approx(total, rel=1e-5)

    def test_loss_mode_ce_only_uses_prod_labels(self, setup, rng):
        cfg, bb, state = setup
        cfg4 = _tiny_cfg(only_feature_embeddings=None,
                         only_target_labels=True)
        assert cfg4.loss_mode == "ce_only"
        m = jax.jit(build_eval_step(bb, cfg4))(state, _fake_batch(rng))
        assert set(k for k in m if k.startswith("val_loss")) == {
            "val_loss", "val_loss_ce_ims"}

    def test_ce_only_prod_labels_need_prod_sized_head(self, rng):
        """ce_only targets prod_idx; with a head sized by categories
        (the reference's own sizing, train.py:64 vs :236-241) the jit CE
        gather silently returns NaN — the CLI therefore sizes the head by
        get_prod_length() in that mode. Pin both behaviors."""
        cfg = _tiny_cfg(only_feature_embeddings=None,
                        only_target_labels=True)
        batch = _fake_batch(rng, n_cls=6)       # prod labels up to 5
        batch["prod_idx"] = jnp.asarray([0, 1, 2, 3, 4, 5, 5, 4],
                                        dtype=jnp.int32)

        def one_step(num_classes):
            bb = create_model(cfg.model_name, num_classes=num_classes,
                              depth_mult=0.1, width_mult=0.5)
            variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
            state = EmbedTrainState.from_backbone(
                bb, variables, make_optimizer("Adam", 1e-3, 0.0))
            _, metrics = jax.jit(build_train_step(bb, cfg))(
                state, batch, jax.random.key(1))
            return float(metrics["train_loss"])

        assert np.isfinite(one_step(6))         # prod-sized head: sound
        # cat-sized head: the documented silent-NaN hazard the CLI avoids
        assert not np.isfinite(one_step(3))


class TestLearningSignal:
    def test_loss_decreases_on_fixed_batch(self, rng):
        """Optimization sanity: repeated steps on one batch reduce the loss
        (catches sign errors in losses/grads that shape tests can't)."""
        cfg = _tiny_cfg(learning_rate=1e-3)
        bb = create_model(cfg.model_name, num_classes=4,
                          depth_mult=0.1, width_mult=0.5)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        tx = make_optimizer("Adam", 1e-3, 1e-5)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        step = jax.jit(build_train_step(bb, cfg))
        batch = _fake_batch(rng)
        losses = []
        for i in range(12):
            state, metrics = step(state, batch, jax.random.key(0))
            losses.append(float(metrics["train_loss"]))
        assert losses[-1] < losses[0] * 0.8, losses


class TestWeightedEval:
    def test_eval_epoch_weights_partial_batches(self):
        """Eval/test epoch means are item-weighted: a ``drop_last=False``
        partial final batch must not carry a full batch's weight (the
        reference's Lightning epoch aggregation weights logged step values
        by batch size)."""
        cfg = _tiny_cfg()
        bb = create_model(cfg.model_name, num_classes=4,
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, train_loader=[None])
        batches = [
            {"image": np.zeros((8, 4, 4, 3), np.uint8)},
            {"image": np.zeros((8, 4, 4, 3), np.uint8)},
            {"image": np.zeros((4, 4, 4, 3), np.uint8)},  # partial
        ]
        trainer._eval_step = lambda state, b: {
            "val_top1": jnp.asarray(
                1.0 if jax.tree.leaves(b)[0].shape[0] == 8 else 0.0)}
        out = trainer.eval_epoch(state=None, loader=batches)
        # item-level: 16/20 hits, NOT the unweighted batch mean 2/3
        assert out["val_top1"] == pytest.approx(16 / 20)
        res = trainer.test(state=None, test_loader=batches)
        assert res["test_top1"] == pytest.approx(16 / 20)


class TestTrainerEndToEnd:
    def test_fit_two_epochs_on_synthetic_sketchy(self, tmp_path):
        root = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=6, n_sketches=3, size=32)
        cfg = _tiny_cfg(batch_size=8, checkpoint_dir=str(tmp_path / "ckpt"),
                        max_epochs=2, learning_rate=1e-3)
        ds = SketchyImageDataset(data_dir=root)
        tr = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=0)
        va = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=1)
        bb = create_model(cfg.model_name, num_classes=ds.get_cat_length(),
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, tr, va)
        assert jax.device_count() == 8  # sanity: virtual mesh active
        state, history = trainer.fit()
        assert len(history["epochs"]) == 2
        e = history["epochs"][-1]
        assert np.isfinite(e["train_loss"]) and np.isfinite(e["val_loss"])
        assert 0 <= e["val_top1"] <= e["val_top3"] <= 1
        # checkpoint written and restorable
        assert trainer.ckpt.best_step() is not None
        restored = trainer.ckpt.restore(jax.device_get(state))
        ra = jax.tree.leaves(restored.params)[0]
        assert np.isfinite(np.asarray(ra)).all()

    def test_fit_without_val_loader_still_checkpoints(self, tmp_path):
        """No --split_json -> no val loader; weights must still be saved
        (ADVICE r1: fit used to run with zero checkpoints in this mode)."""
        root = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=6, n_sketches=3, size=32)
        cfg = _tiny_cfg(batch_size=8, checkpoint_dir=str(tmp_path / "ckpt"),
                        max_epochs=1, learning_rate=1e-3)
        ds = SketchyImageDataset(data_dir=root)
        tr = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=0)
        bb = create_model(cfg.model_name, num_classes=ds.get_cat_length(),
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, tr, val_loader=None)
        state, history = trainer.fit()
        assert trainer.ckpt.latest_step() is not None
        restored = trainer.ckpt.restore(jax.device_get(state))
        ra = jax.tree.leaves(restored.params)[0]
        assert np.isfinite(np.asarray(ra)).all()


class TestMonitorSelection:
    """Checkpoint/early-stop monitor plumbing (trainer.__init__)."""

    def _classifier_pair(self, tmp_path):
        from imageretrievalresearch_tpu.data.imagefolder import (
            ImageFolderDataset,
        )
        from imageretrievalresearch_tpu.data.synthetic import (
            make_imagefolder_tree,
        )

        tree = make_imagefolder_tree(str(tmp_path / "if"), n_classes=2,
                                     n_images=8, size=32)
        tr = TripletLoader(ImageFolderDataset(tree, split="train"), 8,
                           num_workers=2)
        va = TripletLoader(ImageFolderDataset(tree, split="val"), 8,
                           num_workers=2, drop_last=False)
        return tr, va

    def test_classification_remaps_default_triplet_monitor(self, tmp_path):
        """dataset=imagefolder with the config-default monitor (cos_sims, a
        triplet metric the classifier eval never emits) must monitor
        val_top1 instead of silently saving zero checkpoints."""
        tr, va = self._classifier_pair(tmp_path)
        cfg = _tiny_cfg(dataset="imagefolder",
                        only_feature_embeddings=None,
                        only_target_labels=True,
                        checkpoint_dir=str(tmp_path / "ckpt"))
        assert cfg.monitor == "cos_sims"          # the config default
        bb = create_model("efficientnet_b0", num_classes=2,
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, tr, va)
        assert trainer._monitor == "val_top1"
        assert trainer._monitor_mode == "max"

    def test_explicit_monitor_is_kept(self, tmp_path):
        tr, va = self._classifier_pair(tmp_path)
        cfg = _tiny_cfg(dataset="imagefolder",
                        only_feature_embeddings=None,
                        only_target_labels=True, monitor="val_loss",
                        monitor_mode="min")
        bb = create_model("efficientnet_b0", num_classes=2,
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, tr, va)
        assert trainer._monitor == "val_loss"

    def test_resume_seeds_early_stop_best_from_metrics_log(self, tmp_path):
        """A resumed run must remember its pre-preemption best monitored
        value, or a worse post-resume epoch restarts the patience window."""
        import json
        import os

        root = make_sketchy_tree(str(tmp_path / "sk"), n_cats=2, n_prods=1,
                                 n_photos=4, n_sketches=2, size=32)
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(ckpt, exist_ok=True)
        with open(os.path.join(ckpt, "metrics.jsonl"), "w") as f:
            for v in (0.4, 0.9, 0.6):
                f.write(json.dumps({"cos_sims": v, "step": 1}) + "\n")
            f.write("{torn line")        # preemption can tear the tail
        cfg = _tiny_cfg(checkpoint_dir=ckpt)
        ds = SketchyImageDataset(data_dir=root)
        tr = TripletLoader(ds, cfg.batch_size, num_workers=2)
        va = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=1)
        bb = create_model("efficientnet_b0", num_classes=2,
                          depth_mult=0.1, width_mult=0.5)
        trainer = Trainer(cfg, bb, tr, va)
        assert trainer._logged_monitor_best() == pytest.approx(0.9)
