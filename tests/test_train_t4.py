"""T4 recipe end-to-end: TripleDataset (class-folder layout) -> Swin
embed-only backbone -> cosine-embedding-only training
(reference train/train_vit_triplet.py parity path)."""

import numpy as np
import jax

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.data import TripleDataset, TripletLoader
from imageretrievalresearch_tpu.data.synthetic import make_classfolder_tree
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.train import Trainer


def test_t4_swin_triplet_path(tmp_path):
    photo_root, sketch_root = make_classfolder_tree(
        str(tmp_path / "cf"), n_classes=3, n_photos=6, n_sketches=4,
        size=32)
    cfg = TrainConfig(model_name="swin_s3_tiny_224",
                      only_feature_embeddings=True, only_target_labels=None,
                      cos_margin=0.2, batch_size=8, image_size=32,
                      compute_dtype="float32", max_epochs=1, num_workers=2,
                      log_every_n_steps=1000,
                      milestones=(10, 20, 30, 40, 50))
    assert cfg.loss_mode == "cos_only"
    ds = TripleDataset(photo_root, sketch_root)
    dl = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=0,
                       host_size=32)
    # embedding-only Swin (the reference's base_model.head = Identity(),
    # train_vit_triplet.py:357), tiny config for CPU compile time
    bb = create_model(cfg.model_name, num_classes=0, embed_only=True,
                      img_size=32, embed_dim=16, depths=(1, 1),
                      num_heads=(2, 4), window_sizes=(7, 7),
                      drop_path_rate=0.1)
    trainer = Trainer(cfg, bb, dl, dl)
    state, history = trainer.fit()
    e = history["epochs"][-1]
    assert np.isfinite(e["train_loss"]) and np.isfinite(e["val_loss"])
    # cos-only mode: no CE components in val metrics
    assert not any(k.startswith("val_loss_ce") for k in e)
    assert "val_loss_cos_poss" in e
    assert 0 <= e["val_top1"] <= e["val_top3"] <= 1
