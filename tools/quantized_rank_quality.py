"""bf16/int8 serving-mode ranking quality on TRAINED embeddings.

Round-2 measured int8/bf16 ranking agreement only on i.i.d. Gaussian
embeddings (PERF.md). Trained retrieval embeddings are CLUSTERED with far
tighter inter-item score margins — the regime where bf16/int8 rounding
actually flips ranks. This tool embeds a large synthetic gallery with the
CONVERGED T1 model from the convergence-parity harness and re-measures
top-1 agreement / recall@k of the compact serving modes vs f32, with a
same-shape Gaussian control.

Prereq: tools/convergence_parity.py --recipe t1 --phase jax has run
(artifacts under --parity_dir). Run:

    python tools/quantized_rank_quality.py \
        --parity_dir /tmp/cparity/t1 --gallery 4096 --queries 512
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_images(n: int, *, size: int = 32, n_cats: int = 6,
                 n_prods: int = 2, sketch: bool = False,
                 seed: int = 0) -> np.ndarray:
    """Images from the SAME distribution the parity model trained on
    (per-(cat,prod) low-frequency base + noise; sketches inverted)."""
    from imageretrievalresearch_tpu.data.synthetic import _class_base

    rng = np.random.default_rng(seed)
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        c, p = int(rng.integers(n_cats)), int(rng.integers(n_prods))
        base = _class_base(c, p, size)
        if sketch:
            base = 255.0 - base
        out[i] = np.clip(base + rng.normal(0, 28.0, base.shape),
                         0, 255).astype(np.uint8)
    return out


def embed_all(backbone, variables, imgs: np.ndarray, bs: int = 256
              ) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda v, x: backbone.embed(v, x, train=False))
    outs = []
    # the final partial batch is embedded too (one extra compile at the
    # remainder shape) — silently dropping it would shrink the measured
    # gallery/query sizes below what the caller asked for
    for i in range(0, len(imgs), bs):
        x = jnp.asarray(imgs[i:i + bs], jnp.float32) / 255.0
        outs.append(np.asarray(fn(variables, x)))
    return np.concatenate(outs)


def rank_agreement(q: np.ndarray, g: np.ndarray, *, k: int = 150) -> dict:
    """top-1 agreement + recall@k of bf16/int8 exact ranking vs f32."""
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import cosine_topk

    k = min(k, g.shape[0])
    ref_vals, ref_inds = cosine_topk(jnp.asarray(q), jnp.asarray(g), k)
    ref_inds = np.asarray(ref_inds)
    out = {}
    for dtype in ("bfloat16", "int8"):
        _, inds = cosine_topk(jnp.asarray(q), jnp.asarray(g), k,
                              matmul_dtype=dtype)
        inds = np.asarray(inds)
        top1 = float(np.mean(inds[:, 0] == ref_inds[:, 0]))
        recall = float(np.mean([
            len(set(inds[i]) & set(ref_inds[i])) / k
            for i in range(len(inds))]))
        out[dtype] = {"top1_agreement": top1, f"recall@{k}": recall}
    # score-margin context: how tight are the top-1 vs top-2 gaps?
    vals = np.asarray(ref_vals)
    out["median_top1_margin"] = float(np.median(vals[:, 0] - vals[:, 1]))
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--parity_dir", default="/tmp/cparity/t1",
                   help="convergence_parity t1 workdir (jax_best.pkl)")
    p.add_argument("--gallery", type=int, default=4096)
    p.add_argument("--queries", type=int, default=512)
    p.add_argument("--k", type=int, default=150)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.ops.retrieval import l2_normalize

    with open(os.path.join(args.parity_dir, "jax_best.pkl"), "rb") as f:
        jv = pickle.load(f)
    variables = jv["last"]          # the CONVERGED model
    n_cls = (variables["net"]["params"]["head"]["classifier"]["kernel"]
             .shape[1])
    bb = create_model("efficientnet_b0", num_classes=n_cls, depth_mult=0.1,
                      width_mult=0.5, drop_rate=0.0)

    g_imgs = synth_images(args.gallery, sketch=True, seed=10)
    q_imgs = synth_images(args.queries, sketch=False, seed=11)
    g = np.asarray(l2_normalize(embed_all(bb, variables, g_imgs)))
    q = np.asarray(l2_normalize(embed_all(bb, variables, q_imgs)))

    trained = rank_agreement(q, g, k=args.k)

    rng = np.random.default_rng(0)
    gr = np.asarray(l2_normalize(
        rng.normal(size=g.shape).astype(np.float32)))
    qr = np.asarray(l2_normalize(
        rng.normal(size=q.shape).astype(np.float32)))
    gaussian = rank_agreement(qr, gr, k=args.k)

    out = {"dim": int(g.shape[1]), "gallery": int(g.shape[0]),
           "queries": int(q.shape[0]), "k": args.k,
           "trained": trained, "gaussian_control": gaussian}
    txt = json.dumps(out, indent=2)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
