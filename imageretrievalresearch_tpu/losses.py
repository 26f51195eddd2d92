"""Loss functions with exact reference semantics, as pure JAX functions.

The reference uses three losses (and sums of them):

- ``torch.nn.CosineEmbeddingLoss(margin)`` with broadcast scalar targets +1/-1
  (reference train/train.py:139, :214-216; margins 0.5 / 0.3 / 0.2 across the
  training recipes).
- A hand-written Euclidean ``ContrastiveLoss(margin)``
  (reference utils/contrastive_loss.py:31-61) with targets 1/0.
- ``torch.nn.CrossEntropyLoss`` over the classifier logits
  (reference train/train.py:140, :219-221).

All functions are shape-polymorphic, jit-friendly, and operate on a batch of
embeddings ``(B, D)`` (or logits ``(B, C)``), returning a scalar by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch.nn.CosineSimilarity default eps used throughout the reference
# (train/train.py:73: CosineSimilarity(dim=1, eps=1e-6)).
COSINE_SIM_EPS = 1e-6
# torch.nn.CosineEmbeddingLoss adds 1e-12 to each SQUARED norm inside the
# denominator: cos = <x1,x2> / sqrt((||x1||^2+eps)(||x2||^2+eps)).
# (NOT a norm clamp like CosineSimilarity — verified against the installed
# torch: x1=x2 at norm 1e-5 gives loss 0.0099, a clamp would give 0.)
_COS_EMBED_SQ_EPS = 1e-12
# reference utils/contrastive_loss.py:34 (self.eps = 1e-9).
CONTRASTIVE_EPS = 1e-9


def cosine_similarity(x1: jax.Array, x2: jax.Array, *, axis: int = -1,
                      eps: float = COSINE_SIM_EPS) -> jax.Array:
    """Cosine similarity with torch.nn.CosineSimilarity semantics.

    torch >= 1.12 (the reference's pin) clamps EACH norm at eps before
    dividing — ``dot / (max(||x1||, eps) * max(||x2||, eps))`` (pytorch
    PR 74469; verified against the installed torch: cos(1e-8-norm vs
    unit) = 0.01, not 1.0). The reference instantiates it as
    ``CosineSimilarity(dim=1, eps=1e-6)`` (train/train.py:73) for both the
    in-batch metric loop and the gallery ranking
    (inference/training_analysis.ipynb cell 2).
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    dot = jnp.sum(x1 * x2, axis=axis)
    n1 = jnp.maximum(jnp.linalg.norm(x1, axis=axis), eps)
    n2 = jnp.maximum(jnp.linalg.norm(x2, axis=axis), eps)
    return dot / (n1 * n2)


def cosine_embedding_loss(x1: jax.Array, x2: jax.Array, target: jax.Array | float,
                          *, margin: float = 0.0, reduction: str = "mean") -> jax.Array:
    """torch.nn.CosineEmbeddingLoss parity.

    Per row: ``1 - cos(x1, x2)`` when target == 1, and
    ``max(0, cos(x1, x2) - margin)`` when target == -1. The reference always
    passes a broadcast scalar target (train/train.py:81 ``labels``;
    :214-215 usage). torch's internal cos adds 1e-12 to each squared norm
    (see ``_COS_EMBED_SQ_EPS``), which matters exactly for near-dead
    embeddings early in training.
    """
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    dot = jnp.sum(x1 * x2, axis=-1)
    sq1 = jnp.sum(jnp.square(x1), axis=-1) + _COS_EMBED_SQ_EPS
    sq2 = jnp.sum(jnp.square(x2), axis=-1) + _COS_EMBED_SQ_EPS
    cos = dot / jnp.sqrt(sq1 * sq2)
    target = jnp.asarray(target, dtype=jnp.float32)
    target = jnp.broadcast_to(target, cos.shape)
    pos_loss = 1.0 - cos
    neg_loss = jnp.maximum(0.0, cos - margin)
    losses = jnp.where(target > 0, pos_loss, neg_loss)
    return _reduce(losses, reduction)


def contrastive_loss(fm1: jax.Array, fm2: jax.Array, label: jax.Array | float,
                     *, margin: float, mean: bool = True,
                     eps: float = CONTRASTIVE_EPS) -> jax.Array:
    """Euclidean contrastive loss, exact reference formula.

    reference utils/contrastive_loss.py:56-61::

        dis    = (fm2 - fm1).pow(2).sum(1)
        losses = 0.5 * (label * dis
                        + (1 - label) * relu(margin - sqrt(dis + eps)) ** 2)
        return losses.mean() if mean else losses.sum()

    ``label`` is 1. for positive pairs and 0. for negative pairs
    (utils/contrastive_loss.py:25-26). Note the eps lives *inside* the sqrt.
    """
    fm1 = fm1.astype(jnp.float32)
    fm2 = fm2.astype(jnp.float32)
    dis = jnp.sum(jnp.square(fm2 - fm1), axis=1)
    label = jnp.asarray(label, dtype=jnp.float32)
    hinge = jax.nn.relu(margin - jnp.sqrt(dis + eps))
    losses = 0.5 * (label * dis + (1.0 - label) * jnp.square(hinge))
    return jnp.mean(losses) if mean else jnp.sum(losses)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       *, reduction: str = "mean") -> jax.Array:
    """torch.nn.CrossEntropyLoss parity for integer class labels.

    Used on the classifier-head outputs of all three images in the triplet
    recipes (reference train/train.py:219-221) and alone in the
    classification recipe (train/train_vit_crossentropy.py:202).
    """
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return _reduce(nll, reduction)


def _reduce(losses: jax.Array, reduction: str) -> jax.Array:
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction == "none":
        return losses
    raise ValueError(f"unknown reduction {reduction!r}")


def triplet_losses(fm_qry: jax.Array, fm_pos: jax.Array, fm_neg: jax.Array,
                   *, cos_margin: float) -> dict[str, jax.Array]:
    """The cosine-embedding pair of losses used by every triplet recipe.

    ``loss_cos_poss + loss_cos_negs`` with targets +1 / -1
    (reference train/train.py:214-216).
    """
    loss_cos_poss = cosine_embedding_loss(fm_qry, fm_pos, 1.0, margin=cos_margin)
    loss_cos_negs = cosine_embedding_loss(fm_qry, fm_neg, -1.0, margin=cos_margin)
    return {
        "loss_cos_poss": loss_cos_poss,
        "loss_cos_negs": loss_cos_negs,
        "loss_cos": loss_cos_poss + loss_cos_negs,
    }


def contrastive_pair_losses(fm_qry: jax.Array, fm_pos: jax.Array,
                            fm_neg: jax.Array, *, margin: float) -> dict[str, jax.Array]:
    """Contrastive pos/neg pair, targets 1 / 0.

    reference train/train_efficient_cos_con_ce_loss.py:233-238.
    """
    loss_con_poss = contrastive_loss(fm_qry, fm_pos, 1.0, margin=margin)
    loss_con_negs = contrastive_loss(fm_qry, fm_neg, 0.0, margin=margin)
    return {
        "loss_con_poss": loss_con_poss,
        "loss_con_negs": loss_con_negs,
        "loss_con": loss_con_poss + loss_con_negs,
    }
