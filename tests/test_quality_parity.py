"""End-to-end training-dynamics parity vs a literal torch replica.

The closest in-env proxy for the "top1/top3 within 0.5% of the reference"
north star (no Sketchy data / egress in the sandbox): train the SAME
shrunken efficientnet-b0 cos+CE recipe in this framework and in a torch
replica — identical weights (via the converter), identical float batches
(same loader order), identical AdamW/LR — and require the loss trajectory
and final parameters to track within float-accumulation tolerance. Any
gradient/optimizer/loss-semantics bug shows up as immediate divergence.

The torch loop mirrors THIS framework's fused triplet forward (one
concatenated batch through BN, train/steps.py::_forward_triplet) rather
than the reference's three per-role passes; BN-batch-composition is the
one documented semantic difference vs the reference (VERDICT r1 deems the
metric effect negligible).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.data import SketchyImageDataset, TripletLoader
from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree
from imageretrievalresearch_tpu.models import create_model
from imageretrievalresearch_tpu.models.convert import convert_torch_state_dict
from imageretrievalresearch_tpu.train import (
    EmbedTrainState,
    build_train_step,
    make_optimizer,
)

from test_convert_fullsize import TorchEffNet

pytestmark = pytest.mark.slow

LR, WD, STEPS = 1e-3, 1e-5, 10


def _float_batches(tree, n_steps, batch_size=8):
    ds = SketchyImageDataset(data_dir=tree)
    dl = TripletLoader(ds, batch_size, num_workers=2, seed=0)
    out = []
    it = iter(dl)
    epoch = 0
    while len(out) < n_steps:
        try:
            b = next(it)
        except StopIteration:
            epoch += 1
            dl.set_epoch(epoch)
            it = iter(dl)
            continue
        out.append({
            "qry": b["qry"].astype(np.float32) / 255.0,
            "pos": [b["pos"][0].astype(np.float32) / 255.0],
            "neg": [b["neg"][0].astype(np.float32) / 255.0],
            "cat_idx": b["cat_idx"],
            "prod_idx": b["prod_idx"],
        })
    return out, ds.get_cat_length()


class _TorchContrastive(torch.nn.Module):
    """Literal transcription of reference utils/contrastive_loss.py:31-61
    (eps inside the sqrt, 0.5 * (y d^2 + (1-y) relu(m - sqrt(d^2+eps))^2))."""

    def __init__(self, margin):
        super().__init__()
        self.margin = margin
        self.eps = 1e-9

    def forward(self, fm1, fm2, label):
        d2 = torch.sum((fm1 - fm2) ** 2, dim=1)
        d = torch.sqrt(d2 + self.eps)
        loss = 0.5 * (label * d2
                      + (1 - label) * torch.relu(self.margin - d) ** 2)
        return loss.mean()


def _torch_step(model, opt, batch, margin=0.5, con_margin=None):
    """This framework's cos_ce / cos_con_ce train step, literally in torch."""
    qry = torch.from_numpy(batch["qry"].transpose(0, 3, 1, 2))
    pos = torch.from_numpy(batch["pos"][0].transpose(0, 3, 1, 2))
    neg = torch.from_numpy(batch["neg"][0].transpose(0, 3, 1, 2))
    lbl = torch.from_numpy(batch["cat_idx"]).long()
    b = qry.shape[0]
    x = torch.cat([qry, pos, neg], dim=0)
    fm = model.forward_features(x).mean((2, 3))
    logits = model.classifier(fm)
    fm_q, fm_p, fm_n = fm[:b], fm[b:2 * b], fm[2 * b:]
    lb_q, lb_p = logits[:b], logits[b:2 * b]
    cos = torch.nn.CosineEmbeddingLoss(margin=margin)
    ce = torch.nn.CrossEntropyLoss()
    ones = torch.ones(b)
    loss = (cos(fm_q, fm_p, ones) + cos(fm_q, fm_n, -ones)
            + ce(lb_q, lbl) + ce(lb_p, lbl))
    if con_margin is not None:
        con = _TorchContrastive(con_margin)
        loss = loss + con(fm_q, fm_p, ones) + con(fm_q, fm_n, 1 - ones)
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss.detach())


class TestTrainingDynamicsParity:
    def test_loss_trajectory_tracks_torch(self, tmp_path):
        tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=8, n_sketches=4, size=32)
        batches, n_cls = _float_batches(tree, STEPS)

        torch.manual_seed(0)
        tmodel = TorchEffNet(width_mult=0.5, depth_mult=0.1,
                             num_classes=n_cls).train()
        opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)

        cfg = TrainConfig(model_name="efficientnet_b0", batch_size=8,
                          image_size=32, compute_dtype="float32",
                          learning_rate=LR, weight_decay=WD)
        bb = create_model("efficientnet_b0", num_classes=n_cls,
                          depth_mult=0.1, width_mult=0.5, drop_rate=0.0)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        tx = make_optimizer("Adam", LR, WD)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        step = jax.jit(build_train_step(bb, cfg, None))

        ours, theirs = [], []
        for i, b in enumerate(batches):
            jb = {"qry": jnp.asarray(b["qry"]),
                  "pos": [jnp.asarray(b["pos"][0])],
                  "neg": [jnp.asarray(b["neg"][0])],
                  "cat_idx": jnp.asarray(b["cat_idx"]),
                  "prod_idx": jnp.asarray(b["prod_idx"])}
            state, metrics = step(state, jb, jax.random.key(i))
            ours.append(float(metrics["train_loss"]))
            theirs.append(_torch_step(tmodel, opt, b,
                                      margin=cfg.cos_margin))

        ours, theirs = np.asarray(ours), np.asarray(theirs)
        np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
        # both actually learned (loss moved), so the comparison is live
        assert theirs[-1] != theirs[0]

        # final parameters track after STEPS optimizer steps
        tsd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        check = tsd["classifier.weight"].T
        ours_w = np.asarray(
            state.params["net"]["head"]["classifier"]["kernel"])
        np.testing.assert_allclose(ours_w, check, rtol=5e-2, atol=5e-4)

    def test_cos_con_ce_trajectory_tracks_torch(self, tmp_path):
        """T3 — the reference's best recipe (cos+con+CE, margins 0.3/0.3,
        train_efficient_cos_con_ce_loss.py) — same harness as above."""
        tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=8, n_sketches=4, size=32)
        batches, n_cls = _float_batches(tree, STEPS)

        torch.manual_seed(0)
        tmodel = TorchEffNet(width_mult=0.5, depth_mult=0.1,
                             num_classes=n_cls).train()
        opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)

        cfg = TrainConfig(model_name="efficientnet_b0", batch_size=8,
                          image_size=32, compute_dtype="float32",
                          learning_rate=LR, weight_decay=WD,
                          use_contrastive=True, cos_margin=0.3,
                          con_margin=0.3)
        assert cfg.loss_mode == "cos_con_ce"
        bb = create_model("efficientnet_b0", num_classes=n_cls,
                          depth_mult=0.1, width_mult=0.5, drop_rate=0.0)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        tx = make_optimizer("Adam", LR, WD)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        step = jax.jit(build_train_step(bb, cfg, None))

        ours, theirs = [], []
        for i, b in enumerate(batches):
            jb = {"qry": jnp.asarray(b["qry"]),
                  "pos": [jnp.asarray(b["pos"][0])],
                  "neg": [jnp.asarray(b["neg"][0])],
                  "cat_idx": jnp.asarray(b["cat_idx"]),
                  "prod_idx": jnp.asarray(b["prod_idx"])}
            state, metrics = step(state, jb, jax.random.key(i))
            ours.append(float(metrics["train_loss"]))
            theirs.append(_torch_step(tmodel, opt, b, margin=cfg.cos_margin,
                                      con_margin=cfg.con_margin))

        ours, theirs = np.asarray(ours), np.asarray(theirs)
        np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
        assert theirs[-1] != theirs[0]

    def test_swin_cos_only_trajectory_tracks_torch(self, tmp_path):
        """T4 — the transformer path (train_vit_triplet.py: swin, embedding
        cosine loss margin 0.2 only) — same harness, shrunken Swin vs the
        literal torch replica from test_convert_swin."""
        from test_convert_swin import TorchSwin

        tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=8, n_sketches=4, size=56)
        batches, n_cls = _float_batches(tree, STEPS, batch_size=4)

        torch.manual_seed(3)
        tmodel = TorchSwin(num_classes=n_cls).train()
        opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=WD)

        cfg = TrainConfig(model_name="swin_tiny_patch4_window7_224",
                          batch_size=4, image_size=56,
                          compute_dtype="float32", learning_rate=LR,
                          weight_decay=WD, cos_margin=0.2,
                          only_feature_embeddings=True,
                          only_target_labels=None)
        assert cfg.loss_mode == "cos_only"
        bb = create_model("swin_tiny_patch4_window7_224", num_classes=n_cls,
                          img_size=56, embed_dim=24, depths=(2, 2),
                          num_heads=(2, 4), window_sizes=(7, 7),
                          drop_path_rate=0.0)
        variables = bb.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
        variables = convert_torch_state_dict(tmodel.state_dict(), bb,
                                             variables, strict=True)
        tx = make_optimizer("Adam", LR, WD)
        state = EmbedTrainState.from_backbone(bb, variables, tx)
        step = jax.jit(build_train_step(bb, cfg, None))

        cos = torch.nn.CosineEmbeddingLoss(margin=0.2)
        ours, theirs = [], []
        for i, b in enumerate(batches):
            jb = {"qry": jnp.asarray(b["qry"]),
                  "pos": [jnp.asarray(b["pos"][0])],
                  "neg": [jnp.asarray(b["neg"][0])],
                  "cat_idx": jnp.asarray(b["cat_idx"]),
                  "prod_idx": jnp.asarray(b["prod_idx"])}
            state, metrics = step(state, jb, jax.random.key(i))
            ours.append(float(metrics["train_loss"]))

            qry = torch.from_numpy(b["qry"].transpose(0, 3, 1, 2))
            pos = torch.from_numpy(b["pos"][0].transpose(0, 3, 1, 2))
            neg = torch.from_numpy(b["neg"][0].transpose(0, 3, 1, 2))
            bs = qry.shape[0]
            fm = tmodel.forward_features(
                torch.cat([qry, pos, neg], dim=0)).mean(1)
            ones = torch.ones(bs)
            loss = (cos(fm[:bs], fm[bs:2 * bs], ones)
                    + cos(fm[:bs], fm[2 * bs:], -ones))
            opt.zero_grad()
            loss.backward()
            opt.step()
            theirs.append(float(loss.detach()))

        ours, theirs = np.asarray(ours), np.asarray(theirs)
        np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=2e-3)
        assert theirs[-1] != theirs[0]
