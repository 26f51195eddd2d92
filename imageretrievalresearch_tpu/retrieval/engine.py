"""RetrievalEngine — precompute-gallery + fused ranking, both eval variants.

The compiled replacement for the reference's two inference paths:

- the notebook path (training_analysis.ipynb cell 2): embed the test set
  (head = Identity), gallery = ALL positive embeddings, per query
  ``topk(cos, k=150)`` -> dedup to 3 unique classes -> top1/top3 by class;
- the script path (inference/inference.py:152-245): ContrastiveLoss eval +
  top-k hit iff retrieved index == query index.

Embedding runs as one jitted batched program; ranking via
ops.retrieval.cosine_topk (blocked MXU matmul + two-stage top-k; optional
Pallas fused scores kernel).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from imageretrievalresearch_tpu import metrics as M
from imageretrievalresearch_tpu.losses import contrastive_loss
from imageretrievalresearch_tpu.models.backbone import Backbone
from imageretrievalresearch_tpu.ops.retrieval import cosine_topk, l2_normalize


class RetrievalEngine:
    def __init__(self, backbone: Backbone, variables: dict,
                 *, transform: Callable | None = None,
                 use_pallas: bool = False, interpret: bool = False):
        self.backbone = backbone
        self.variables = variables
        self.transform = transform
        self.use_pallas = use_pallas
        self.interpret = interpret
        self._embed = jax.jit(
            lambda v, x: backbone.embed(v, x, train=False))

    # --- embedding ---

    def embed_batch(self, images) -> jax.Array:
        x = jnp.asarray(images)
        if self.transform is not None:
            x = self.transform(x)
        return self._embed(self.variables, x)

    def embed_triplet_loader(self, loader: Iterable,
                             *, keep_images: bool = False) -> dict:
        """Embed a triplet loader's qry/pos/neg streams (notebook cell 2)."""
        fms_ims, fms_poss, fms_negs, classes = [], [], [], []
        ims, poss, negs = [], [], []
        for batch in loader:
            for key, store, imstore in (("qry", fms_ims, ims),
                                        ("pos", fms_poss, poss),
                                        ("neg", fms_negs, negs)):
                arr = batch[key][0] if isinstance(batch[key], list) else batch[key]
                store.append(np.asarray(self.embed_batch(arr)))
                if keep_images:
                    imstore.append(np.asarray(arr))
            classes.append(np.asarray(batch["cat_idx"]))
        out = {
            "fms_ims_all": np.concatenate(fms_ims),
            "fms_poss_all": np.concatenate(fms_poss),
            "fms_negs_all": np.concatenate(fms_negs),
            "classes_all": np.concatenate(classes),
        }
        if keep_images:
            out["ims"] = np.concatenate(ims)
            out["poss"] = np.concatenate(poss)
            out["negs"] = np.concatenate(negs)
        return out

    # --- ranking ---

    def search(self, queries: jax.Array, gallery: jax.Array, k: int = 150,
               *, matmul_dtype: str = "float32"
               ) -> tuple[np.ndarray, np.ndarray]:
        """Rank ``gallery`` for each query (``matmul_dtype`` selects the
        bf16/int8 serving arithmetic — see :func:`ops.retrieval.cosine_topk`;
        default f32 keeps reference eval parity)."""
        vals, inds = cosine_topk(jnp.asarray(queries), jnp.asarray(gallery),
                                 k, use_pallas=self.use_pallas,
                                 matmul_dtype=matmul_dtype,
                                 interpret=self.interpret)
        return np.asarray(vals), np.asarray(inds)

    # --- full evaluations ---

    def evaluate_class_dedup(self, embeds: dict, *, k: int = 150,
                             num_unique: int = 3) -> OrderedDict:
        """Notebook-parity evaluation (training_analysis.ipynb cell 2).

        Returns the notebook's OrderedDict surface: top1/top3, mean pairwise
        pos score, embeddings, and per-query deduped topk
        indices/values/classes for visualization.
        """
        q = embeds["fms_ims_all"]
        g = embeds["fms_poss_all"]
        classes = embeds["classes_all"]
        vals, inds = self.search(q, g, k=min(k, len(g)))
        scored = M.dedup_and_score(vals, inds, jnp.asarray(classes),
                                   classes, num_unique=num_unique)
        uniq_inds = np.asarray(scored["topk_inds"])
        uniq_vals = np.asarray(scored["top_vals"])
        uniq_cls = np.asarray(scored["top_r_list"])
        top_n = float(scored[f"top{num_unique}"])
        top_1 = float(scored["top1"])
        pos_scores = _pairwise_cos(q, g)
        neg_scores = _pairwise_cos(q, embeds["fms_negs_all"])
        out = OrderedDict([
            ("top1", top_1), (f"top{num_unique}", top_n),
            ("scores", float(np.mean(pos_scores))),
            ("neg_scores", float(np.mean(neg_scores))),
            ("fms_ims_all", q), ("classes_all", classes),
            ("fms_poss_all", g), ("fms_negs_all", embeds["fms_negs_all"]),
            ("topk_inds", uniq_inds), ("top_vals", uniq_vals),
            ("top_r_list", uniq_cls),
        ])
        for key in ("ims", "poss", "negs"):
            if key in embeds:
                out[key] = embeds[key]
        return out

    def evaluate_index_match(self, embeds: dict, *, margin: float = 0.5
                             ) -> OrderedDict:
        """inference.py-parity evaluation (inference/inference.py:213-245):
        ContrastiveLoss(qry,pos,1.) + index-match top1/top3 + normalized
        embeddings."""
        q = jnp.asarray(embeds["fms_ims_all"])
        g = jnp.asarray(embeds["fms_poss_all"])
        loss = float(contrastive_loss(q, g, 1.0, margin=margin))
        _, inds = self.search(q, g, k=3)
        qidx = np.arange(len(np.asarray(q)))[:, None]
        hits = np.asarray(inds) == qidx
        top3 = float(np.mean(np.any(hits, axis=1)))
        top1 = float(np.mean(hits[:, 0]))
        scores = _pairwise_cos(np.asarray(q), np.asarray(g))
        return OrderedDict([
            ("loss", loss), ("top1", top1), ("top3", top3),
            ("scores", float(np.mean(scores))),
            ("normalized_embeddings", np.asarray(l2_normalize(q))),
        ])


def _pairwise_cos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from imageretrievalresearch_tpu.losses import cosine_similarity
    return np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b)))
