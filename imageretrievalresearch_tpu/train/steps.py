"""Loss-combination train/eval steps — the reference's five recipes as configs.

Each step takes a preprocessed float batch
``{'qry': (B,H,W,3), 'pos': [(B,H,W,3)], 'neg': [(B,H,W,3)],
'cat_idx': (B,), 'prod_idx': (B,)}`` and runs the three backbone passes +
losses + in-batch metrics as ONE compiled program (vs. the reference's three
sequential torch passes + eager metric loop, train/train.py:194-255).

Mode semantics (train/train.py:211-243):
- cos_ce:      cos-embed(pos,+1)+(neg,-1)  +  CE(lbl_qry,cat)+CE(lbl_pos,cat)
- cos_con_ce:  + contrastive(pos,1)+(neg,0)    (T3, margins 0.3/0.3)
- cos_only:    cosine-embedding pair only       (T4)
- ce_only:     CE(lbl_qry, prod_idx) only       (note: reference's CE-only
               branch targets *prod* labels, :239 — preserved)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu import losses as L
from imageretrievalresearch_tpu import metrics as M
from imageretrievalresearch_tpu.config import TrainConfig
from imageretrievalresearch_tpu.models.backbone import Backbone


def _forward_triplet(backbone: Backbone, variables: dict, batch: dict,
                     train: bool, rngs: dict | None, mutable: bool):
    """Three backbone passes as one batched pass (3x less launch overhead,
    BN sees the concatenated triplet batch — reference runs three separate
    passes, each normalizing per-role; metric effect is negligible and the
    fused form keeps the MXU fed)."""
    qry, pos, neg = batch["qry"], batch["pos"][0], batch["neg"][0]
    b = qry.shape[0]
    x = jnp.concatenate([qry, pos, neg], axis=0)
    if mutable:
        emb, logits, updates = backbone.features_and_logits(
            variables, x, train=train, rngs=rngs, mutable=True)
    else:
        emb, logits = backbone.features_and_logits(variables, x, train=train,
                                                   rngs=rngs)
        updates = None
    fm_q, fm_p, fm_n = emb[:b], emb[b:2 * b], emb[2 * b:]
    lb_q, lb_p, lb_n = logits[:b], logits[b:2 * b], logits[2 * b:]
    return (fm_q, fm_p, fm_n), (lb_q, lb_p, lb_n), updates


def _losses_for_mode(cfg: TrainConfig, fms, lbls, batch):
    fm_q, fm_p, fm_n = fms
    lb_q, lb_p, _ = lbls
    clss, regs = batch["cat_idx"], batch["prod_idx"]
    mode = cfg.loss_mode
    out: dict[str, jax.Array] = {}

    if mode in ("cos_ce", "cos_con_ce", "cos_only"):
        cos = L.triplet_losses(fm_q, fm_p, fm_n, cos_margin=cfg.cos_margin)
        out.update(cos)
        total = cos["loss_cos"]
    if mode == "cos_con_ce":
        con = L.contrastive_pair_losses(fm_q, fm_p, fm_n,
                                        margin=cfg.con_margin)
        out.update(con)
        total = total + con["loss_con"]
    if mode in ("cos_ce", "cos_con_ce"):
        out["loss_ce_ims"] = L.cross_entropy_loss(lb_q, clss)
        out["loss_ce_poss"] = L.cross_entropy_loss(lb_p, clss)
        out["loss_ce"] = out["loss_ce_ims"] + out["loss_ce_poss"]
        total = total + out["loss_ce"]
    if mode == "ce_only":
        out["loss_ce_ims"] = L.cross_entropy_loss(lb_q, regs)
        total = out["loss_ce_ims"]

    out["loss"] = total
    return out


def build_train_step(backbone: Backbone, cfg: TrainConfig,
                     schedule=None) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``."""

    def train_step(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(params):
            variables = {
                k: ({"params": params[k], "batch_stats": state.batch_stats[k]}
                    if state.batch_stats and k in state.batch_stats
                    else {"params": params[k]})
                for k in params}
            fms, lbls, updates = _forward_triplet(
                backbone, variables, batch, train=True, rngs=rngs,
                mutable=True)
            loss_dict = _losses_for_mode(cfg, fms, lbls, batch)
            return loss_dict["loss"], (loss_dict, fms, lbls, updates)

        grads, (loss_dict, fms, lbls, updates) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_batch_stats = state.batch_stats
        if updates is not None and state.batch_stats:
            new_batch_stats = dict(state.batch_stats)
            new_batch_stats["net"] = updates["batch_stats"]
        # the lr optax applies to THIS update is schedule(pre-increment
        # step) — read it before apply_gradients bumps the counter, or the
        # logged series reports every milestone drop one step early
        lr_used = schedule(state.step) if schedule is not None else None
        state = state.apply_gradients(grads=grads,
                                      batch_stats=new_batch_stats)

        # in-batch metrics (train/train.py:246-260 loop, vectorized)
        if cfg.loss_mode == "ce_only":
            tk = M.classifier_topk(lbls[0], batch["prod_idx"], k=3)
        else:
            tk = M.inbatch_topk(fms[0], fms[1], batch["cat_idx"], k=3)
        metrics = {
            "train_loss": loss_dict["loss"],
            "train_top3": tk["top3"],
            "train_top1": tk["top1"],
        }
        if lr_used is not None:
            metrics["lr"] = lr_used
        return state, metrics

    return train_step


def build_classifier_train_step(backbone: Backbone, cfg: TrainConfig,
                                schedule=None) -> Callable:
    """Single-image CE classification step (T5,
    train/train_vit_crossentropy.py:180-223): one backbone pass per batch
    ``{'image': (B,H,W,3), 'label': (B,)}``, CE over the folder classes,
    logit top1/top3 metrics."""

    def train_step(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(params):
            variables = {
                k: ({"params": params[k], "batch_stats": state.batch_stats[k]}
                    if state.batch_stats and k in state.batch_stats
                    else {"params": params[k]})
                for k in params}
            _, logits, updates = backbone.features_and_logits(
                variables, batch["image"], train=True, rngs=rngs,
                mutable=True)
            loss = L.cross_entropy_loss(logits, batch["label"])
            return loss, (logits, updates)

        grads, (logits, updates) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_batch_stats = state.batch_stats
        if updates is not None and state.batch_stats:
            new_batch_stats = dict(state.batch_stats)
            new_batch_stats["net"] = updates["batch_stats"]
        # lr applied to THIS update = schedule(pre-increment step); see the
        # triplet step above
        lr_used = schedule(state.step) if schedule is not None else None
        state = state.apply_gradients(grads=grads,
                                      batch_stats=new_batch_stats)
        tk = M.classifier_topk(logits, batch["label"], k=3)
        metrics = {"train_loss": L.cross_entropy_loss(logits, batch["label"]),
                   "train_top3": tk["top3"], "train_top1": tk["top1"]}
        if lr_used is not None:
            metrics["lr"] = lr_used
        return state, metrics

    return train_step


def build_classifier_eval_step(backbone: Backbone, cfg: TrainConfig
                               ) -> Callable:
    """Validation step with the reference's keys
    (train/train_vit_crossentropy.py:265-268): val_loss + logit
    val_top3/val_top1 — monitored metric is val_top1 (mode max)."""

    def eval_step(state, batch):
        variables = state.backbone_variables()
        _, logits = backbone.features_and_logits(
            variables, batch["image"], train=False, rngs=None)
        tk = M.classifier_topk(logits, batch["label"], k=3)
        return {"val_loss": L.cross_entropy_loss(logits, batch["label"]),
                "val_top3": tk["top3"], "val_top1": tk["top1"]}

    return eval_step


def build_eval_step(backbone: Backbone, cfg: TrainConfig) -> Callable:
    """Returns ``eval_step(state, batch) -> metrics`` with the reference's
    validation keys (train/train.py:365-373): val_loss + per-loss components,
    cos_sims/cos_unsims pairwise means, val_top3/val_top1."""

    def eval_step(state, batch):
        variables = state.backbone_variables()
        fms, lbls, _ = _forward_triplet(backbone, variables, batch,
                                        train=False, rngs=None, mutable=False)
        loss_dict = _losses_for_mode(cfg, fms, lbls, batch)
        pair = M.pairwise_cos_stats(*fms)
        if cfg.loss_mode == "ce_only":
            tk = M.classifier_topk(lbls[0], batch["prod_idx"], k=3)
        else:
            tk = M.inbatch_topk(fms[0], fms[1], batch["cat_idx"], k=3)
        metrics = {"val_loss": loss_dict["loss"],
                   "cos_sims": pair["cos_sims"],
                   "cos_unsims": pair["cos_unsims"],
                   "val_top3": tk["top3"],
                   "val_top1": tk["top1"]}
        for k, v in loss_dict.items():
            if k != "loss":
                metrics[f"val_{k}"] = v
        return metrics

    return eval_step
