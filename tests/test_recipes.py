"""Recipe preset and config tests: the T1-T5 parameterizations, loss-mode
triad assertions, and the checkpoint registry surface."""

import pytest

from imageretrievalresearch_tpu.checkpoints import REGISTRY
from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.recipes import RECIPES, make_config


class TestRecipes:
    def test_all_reference_scripts_covered(self):
        for script in ("train", "train_efficientnet",
                       "train_efficient_cos_con_ce_loss",
                       "train_vit_triplet", "train_vit_crossentropy",
                       "find_lr"):
            assert script in RECIPES

    def test_t3_margins_and_schedule(self):
        cfg = make_config("train_efficient_cos_con_ce_loss")
        assert cfg.cos_margin == 0.3 and cfg.con_margin == 0.3
        assert cfg.use_contrastive and cfg.loss_mode == "cos_con_ce"
        assert tuple(cfg.milestones) == (6, 15, 22, 30, 35, 40)

    def test_t4_triplet_only(self):
        cfg = make_config("train_vit_triplet")
        assert cfg.loss_mode == "cos_only"
        assert cfg.cos_margin == 0.2
        assert cfg.learning_rate == 1e-5 and cfg.batch_size == 32

    def test_t5_ce_only_monitor(self):
        cfg = make_config("train_vit_crossentropy")
        assert cfg.loss_mode == "ce_only"
        assert cfg.monitor == "val_top1"

    def test_overrides_and_unknown_fields(self):
        cfg = make_config("train", batch_size=8)
        assert cfg.batch_size == 8
        with pytest.raises(ValueError, match="unknown config fields"):
            make_config("train", nope=1)
        with pytest.raises(ValueError, match="unknown recipe"):
            make_config("train_resnet")


class TestConfig:
    def test_loss_mode_triad(self):
        assert TrainConfig().loss_mode == "cos_ce"
        assert TrainConfig(only_target_labels=None).loss_mode == "cos_only"
        assert TrainConfig(only_feature_embeddings=None).loss_mode == "ce_only"
        # ValueError (not assert): must survive python -O
        with pytest.raises(ValueError, match="at least one loss"):
            TrainConfig(only_feature_embeddings=None,
                        only_target_labels=None).loss_mode

    def test_reference_defaults(self):
        cfg = TrainConfig()
        # train/train.py:483-495 argparse defaults
        assert cfg.batch_size == 64
        assert cfg.model_name == "rexnet_150"
        assert cfg.optimizer_name == "Adam"
        assert cfg.learning_rate == pytest.approx(4.7863e-03)
        assert cfg.weight_decay == 1e-5
        assert cfg.save_path == "saved_models"
        assert cfg.monitor == "cos_sims" and cfg.early_stop_patience == 10


class TestCheckpointRegistry:
    def test_six_published_checkpoints(self):
        assert len(REGISTRY) == 6
        models = {m.model_name for m in REGISTRY.values()}
        assert models == {"rexnet_150", "efficientnet_b3a"}
