"""Train -> checkpoint -> load_checkpoint(dir) -> RetrievalEngine roundtrip:
the full save/restore path a user follows from training to inference."""

import numpy as np
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.data import SketchyImageDataset, TripletLoader
from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import load_checkpoint
from imageretrievalresearch_tpu.train import Trainer


def test_train_checkpoint_resume_inference_roundtrip(tmp_path):
    """One flow covering: fit -> resume from latest step -> load the trainer
    checkpoint dir through the inference loader -> embeddings match."""
    root = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                             n_photos=6, n_sketches=3, size=32)
    cfg = TrainConfig(model_name="efficientnet_b0", batch_size=8,
                      image_size=32, compute_dtype="float32", max_epochs=1,
                      num_workers=2, log_every_n_steps=1000,
                      checkpoint_dir=str(tmp_path / "ckpt"))
    ds = SketchyImageDataset(data_dir=root)
    tr = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=0)
    va = TripletLoader(ds, cfg.batch_size, num_workers=2, seed=1)
    bb = create_model(cfg.model_name, num_classes=ds.get_cat_length(),
                      depth_mult=0.1, width_mult=0.5)
    trainer = Trainer(cfg, bb, tr, va)
    state1, _ = trainer.fit()
    steps_after_1 = int(state1.step)

    # resume for one more epoch (reuses the already-jitted steps)
    state2, _ = trainer.fit(max_epochs=2, resume=True)
    assert int(state2.step) > steps_after_1
    trainer.ckpt.close()

    # load the trainer checkpoint dir through the inference-path loader;
    # best checkpoint = some epoch's end state
    variables = load_checkpoint(str(tmp_path / "ckpt"), bb,
                                sample_shape=(1, 32, 32, 3))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                    dtype=jnp.float32)
    emb_loaded = np.asarray(bb.embed(variables, x))
    assert np.isfinite(emb_loaded).all()
    # the loaded variables must equal one of the saved states' params; check
    # against the final state when it is the best
    best = trainer.ckpt.best_step()
    if best == int(state2.step):
        emb_trained = np.asarray(bb.embed(state2.backbone_variables(), x))
        np.testing.assert_allclose(emb_loaded, emb_trained, rtol=1e-5,
                                   atol=1e-6)
