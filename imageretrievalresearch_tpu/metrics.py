"""Retrieval metrics — the reference's three distinct top-k definitions, vectorized.

The reference computes top-1/top-3 in three different ways (which we preserve
exactly, each as an explicit named variant):

1. **In-batch class match** (training/validation): for each query embedding,
   cosine-sim against *all positive embeddings in the batch*, ``topk(k=3)``,
   hit iff any retrieved index's class equals the query's class.
   Reference does this in an eager per-sample Python loop
   (train/train.py:249-255, :342-362) — here it is one sim-matrix matmul +
   ``jax.lax.top_k``.

2. **Gallery index match** (batch inference): top-k over the full gallery of
   positive embeddings, hit iff a retrieved *index* equals the query index
   (inference/inference.py:235-242).

3. **Gallery unique-class dedup** (the working notebook path):
   ``topk(k=150)`` over the full gallery, dedup retrieved classes in rank
   order to the first 3 *unique* classes; top3 = gt class among them,
   top1 = gt class equals the first
   (inference/training_analysis.ipynb cell 2).

Also here: the pairwise ``cos_sims`` / ``cos_unsims`` scalars that drive the
reference's checkpointing & early stopping (train/train.py:345-353, :370-371).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imageretrievalresearch_tpu.losses import COSINE_SIM_EPS, cosine_similarity


def cosine_sim_matrix(queries: jax.Array, gallery: jax.Array,
                      *, eps: float = COSINE_SIM_EPS) -> jax.Array:
    """All-pairs cosine similarity ``(Q, G)`` with torch eps semantics.

    Equivalent to looping ``cos(q_i, gallery)`` (train/train.py:250) but as a
    single MXU matmul over L2-normalized rows.
    """
    queries = queries.astype(jnp.float32)
    gallery = gallery.astype(jnp.float32)
    qn = jnp.linalg.norm(queries, axis=-1, keepdims=True)
    gn = jnp.linalg.norm(gallery, axis=-1, keepdims=True)
    dots = queries @ gallery.T
    denom = jnp.maximum(qn * gn.T, eps)
    return dots / denom


def inbatch_topk(fm_qry: jax.Array, fm_pos: jax.Array, classes: jax.Array,
                 *, k: int = 3) -> dict[str, jax.Array]:
    """In-batch class-match top-1/top-3 (metric definition #1).

    Returns fractions in [0, 1], matching ``top3 / len(fm_ims)``
    (train/train.py:259-260). ``classes`` is the per-sample ``cat_idx``.
    """
    sims = cosine_sim_matrix(fm_qry, fm_pos)
    # clamp: a drop_last=False final batch can be smaller than k, and
    # lax.top_k raises on k > row length; the metric KEY keeps the
    # requested k so the logged series stays consistent
    k_eff = min(k, sims.shape[-1])
    _, inds = jax.lax.top_k(sims, k_eff)                 # (B, k_eff)
    retrieved = classes[inds]                            # (B, k_eff)
    match = retrieved == classes[:, None]
    top_k = jnp.mean(jnp.any(match, axis=1).astype(jnp.float32))
    top_1 = jnp.mean(match[:, 0].astype(jnp.float32))
    return {f"top{k}": top_k, "top1": top_1}


def pairwise_cos_stats(fm_qry: jax.Array, fm_pos: jax.Array,
                       fm_neg: jax.Array) -> dict[str, jax.Array]:
    """Mean pairwise cos(qry, pos) / cos(qry, neg) over the batch.

    These are the logged ``cos_sims`` / ``cos_unsims`` scalars — ``cos_sims``
    is the checkpoint/early-stop monitor metric (train/train.py:345-353,
    :370-371, :448-451).
    """
    sims = cosine_similarity(fm_qry, fm_pos)
    unsims = cosine_similarity(fm_qry, fm_neg)
    return {"cos_sims": jnp.mean(sims), "cos_unsims": jnp.mean(unsims)}


def gallery_topk_index_match(sims: jax.Array, *, ks: tuple[int, ...] = (1, 3)
                             ) -> dict[str, jax.Array]:
    """Gallery index-match top-k (metric definition #2).

    ``sims`` is the full (Q, G) cosine matrix where query i's true positive
    sits at gallery index i. Hit iff index i appears in the top-k
    (inference/inference.py:235-242).
    """
    n = sims.shape[0]
    out = {}
    kmax = min(max(ks), sims.shape[-1])   # clamp: tiny final eval batches
    _, inds = jax.lax.top_k(sims, kmax)                  # (Q, kmax)
    qidx = jnp.arange(n)[:, None]
    hit = inds == qidx                                   # (Q, kmax)
    for k in ks:
        out[f"top{k}"] = jnp.mean(jnp.any(hit[:, :k], axis=1).astype(jnp.float32))
    return out


def unique_class_dedup(inds: jax.Array, vals: jax.Array, classes: jax.Array,
                       *, num_unique: int = 3) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Dedup a ranked retrieval list to the first ``num_unique`` unique classes.

    Mirrors the notebook loop (training_analysis.ipynb cell 2): walk the
    ranked ``inds`` (indices into the gallery), keep an index/value/class the
    first time its class appears, stop after ``num_unique`` classes.

    Implemented with cumulative first-occurrence masks (no data-dependent
    Python control flow, so it vectorizes under vmap/jit).

    Args:
      inds:    (K,) ranked gallery indices for one query.
      vals:    (K,) their similarity values.
      classes: (G,) class id of each gallery item.

    Returns:
      (uniq_inds, uniq_vals, uniq_classes), each (num_unique,). Slots beyond
      the number of distinct classes present are filled with -1 / -inf / -1
      (cannot occur with real data where K >= num_unique distinct classes).
    """
    k = inds.shape[0]
    inds = jnp.asarray(inds)
    vals = jnp.asarray(vals)
    retrieved_cls = jnp.asarray(classes)[inds]           # (K,)
    # first_occurrence[j] = True iff retrieved_cls[j] not among retrieved_cls[:j]
    eq = retrieved_cls[:, None] == retrieved_cls[None, :]   # (K, K)
    lower = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    seen_before = jnp.any(eq & lower, axis=1)
    first = ~seen_before                                 # (K,)
    # rank among first occurrences (0-based); positions that are not first
    # get rank K (out of range).
    rank = jnp.where(first, jnp.cumsum(first.astype(jnp.int32)) - 1, k)
    # scatter first-occurrence entries into their dedup slot; everything else
    # goes to a dummy overflow slot (num_unique) that is sliced away, so
    # in-range scatter indices are collision-free.
    slot = jnp.where(rank < num_unique, rank, num_unique)
    uniq_inds = jnp.full((num_unique + 1,), -1, dtype=inds.dtype).at[slot].set(inds)
    uniq_vals = jnp.full((num_unique + 1,), -jnp.inf, dtype=vals.dtype).at[slot].set(vals)
    uniq_cls = (jnp.full((num_unique + 1,), -1, dtype=retrieved_cls.dtype)
                .at[slot].set(retrieved_cls))
    return uniq_inds[:num_unique], uniq_vals[:num_unique], uniq_cls[:num_unique]


def dedup_and_score(vals: jax.Array, inds: jax.Array,
                    gallery_classes: jax.Array, query_classes: jax.Array,
                    *, num_unique: int = 3) -> dict[str, jax.Array]:
    """Shared tail of metric definition #3 from an already-ranked
    (vals, inds): per-query unique-class dedup + top1/topN scoring —
    ONE implementation, used by both :func:`gallery_topk_class_dedup` and
    ``RetrievalEngine.evaluate_class_dedup`` (the fused-kernel path), so
    the dedup/fill/tie semantics cannot drift between them."""
    dedup = jax.vmap(
        lambda i, v: unique_class_dedup(i, v, gallery_classes,
                                        num_unique=num_unique))(
        jnp.asarray(inds), jnp.asarray(vals))
    uniq_inds, uniq_vals, uniq_cls = dedup
    query_classes = jnp.asarray(query_classes)
    gt = query_classes[:, None]
    top_n = jnp.mean(jnp.any(uniq_cls == gt, axis=1).astype(jnp.float32))
    top_1 = jnp.mean((uniq_cls[:, 0] == query_classes).astype(jnp.float32))
    return {
        f"top{num_unique}": top_n,
        "top1": top_1,
        "topk_inds": uniq_inds,
        "top_vals": uniq_vals,
        "top_r_list": uniq_cls,
    }


def gallery_topk_class_dedup(sims: jax.Array, query_classes: jax.Array,
                             gallery_classes: jax.Array, *, k: int = 150,
                             num_unique: int = 3) -> dict[str, jax.Array]:
    """Gallery unique-class-dedup top-k (metric definition #3, notebook cell 2).

    Returns top1/top3 fractions plus per-query deduped (indices, values,
    classes) for visualization — the notebook's ``topk_inds`` / ``top_vals`` /
    ``top_r_list`` outputs.
    """
    k = min(k, sims.shape[1])
    vals, inds = jax.lax.top_k(sims, k)                  # (Q, k)
    return dedup_and_score(vals, inds, gallery_classes, query_classes,
                           num_unique=num_unique)


def classifier_topk(logits: jax.Array, labels: jax.Array,
                    *, k: int = 3) -> dict[str, jax.Array]:
    """Classifier-logit top-k for the pure-classification recipe.

    reference train/train_vit_crossentropy.py:209-218 (note: the reference's
    train-step variant indexes *labels* with logit indices — a bug; validation
    uses ``regs[idx] in inds``, i.e. label-in-topk, which is the intent we
    implement).
    """
    _, inds = jax.lax.top_k(logits, k)
    match = inds == labels[:, None]
    return {
        f"top{k}": jnp.mean(jnp.any(match, axis=1).astype(jnp.float32)),
        "top1": jnp.mean(match[:, 0].astype(jnp.float32)),
    }
