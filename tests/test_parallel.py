"""Parallelism tests on the 8-device virtual CPU mesh: data-parallel train
step invariance vs single device, sharding placement, batch padding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from imageretrievalresearch_tpu.train import (
    EmbedTrainState,
    build_train_step,
    make_optimizer,
)


def _setup(num_classes=4):
    cfg = TrainConfig(model_name="efficientnet_b0", image_size=32,
                      compute_dtype="float32")
    bb = create_model(cfg.model_name, num_classes=num_classes,
                      depth_mult=0.1, width_mult=0.5)
    variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    tx = make_optimizer("Adam", 1e-3, 1e-5)
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


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8

    def test_shard_batch_placement(self, rng):
        mesh = make_mesh()
        batch = shard_batch(mesh, _batch(rng))
        sh = batch["qry"].sharding
        assert sh.is_equivalent_to(data_sharding(mesh, 4), 4)

    def test_pad_to_multiple(self, rng):
        batch = _batch(rng, b=13)
        padded, n = pad_to_multiple(batch, 8)
        assert n == 13
        assert padded["qry"].shape[0] == 16
        np.testing.assert_array_equal(padded["qry"][:13], batch["qry"])


class TestDataParallelInvariance:
    def test_dp8_matches_single_device(self, rng):
        """The DDP-equivalence property: training on 8 shards of a global
        batch gives the same loss/update as one device with the full batch
        (global-batch loss mean; XLA derives the grad all-reduce)."""
        cfg, bb, state = _setup()
        step = build_train_step(bb, cfg)
        batch = _batch(rng, b=16)

        mesh8 = make_mesh(8)
        state8 = jax.device_put(state, replicate(mesh8))
        batch8 = shard_batch(mesh8, batch)
        new8, m8 = jax.jit(step)(state8, batch8, jax.random.key(1))

        mesh1 = make_mesh(1)
        state1 = jax.device_put(state, replicate(mesh1))
        batch1 = shard_batch(mesh1, batch)
        new1, m1 = jax.jit(step)(state1, batch1, jax.random.key(1))

        assert float(m8["train_loss"]) == pytest.approx(
            float(m1["train_loss"]), rel=1e-4)
        w8 = np.asarray(jax.tree.leaves(new8.params)[0])
        w1 = np.asarray(jax.tree.leaves(new1.params)[0])
        np.testing.assert_allclose(w8, w1, rtol=1e-3, atol=1e-6)

    def test_metrics_match_too(self, rng):
        cfg, bb, state = _setup()
        from imageretrievalresearch_tpu.train import build_eval_step
        estep = build_eval_step(bb, cfg)
        batch = _batch(rng, b=16)
        mesh8 = make_mesh(8)
        m8 = jax.jit(estep)(jax.device_put(state, replicate(mesh8)),
                            shard_batch(mesh8, batch))
        m1 = jax.jit(estep)(state, jax.tree.map(jnp.asarray, batch))
        for k in ("val_loss", "cos_sims", "val_top3", "val_top1"):
            assert float(m8[k]) == pytest.approx(float(m1[k]), rel=1e-4,
                                                 abs=1e-6), k
