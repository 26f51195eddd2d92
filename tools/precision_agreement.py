"""On-TPU matmul-precision study for the exact retrieval path (VERDICT r4
task 2).

JAX's DEFAULT precision computes nominal-f32 matmuls with bf16-truncated
multiplies on the TPU MXU (one pass). The reference ranks with true-f32
torch cosine scores (train/train.py:73, inference/inference.py:223-242),
so the default-precision TPU path can diverge from the reference on
near-tie rankings. This tool measures, on the real chip:

1. ranking agreement (top-1 / top-k overlap) between precision='default'
   and precision='highest' on NEAR-TIE-DENSE embeddings — clustered
   gallery with margins ~1e-3, the adversarial case for truncation — and
   on the standard random-Gaussian benchmark distribution;
2. fused-kernel vs dense-path agreement at precision='highest' (the
   lax.cond fallback contract under the non-default precision);
3. the throughput cost of 'highest' (pipelined protocol, bench.py).

Run ON THE CHIP (no JAX_PLATFORMS=cpu): ``python tools/precision_agreement.py``.
Results recorded in PERF.md 'Matmul precision on the retrieval path'.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


GALLERY = 100_000
DIM = 1536
QUERIES = 2048
K = 150


def _pipelined_ms(call, n_iter=20, repeats=5):
    call(); call()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = None
        for _ in range(n_iter):
            v = call()
        np.asarray(v[0][:1, :1])
        times.append(time.perf_counter() - t0)
    return min(times) / n_iter * 1e3


def _agreement(i_a, i_b, v_a, v_b, sample=512):
    """top-1 agreement over all rows; top-k set overlap over a row sample
    (a per-row intersect1d over 2048 rows costs minutes on this 1-core
    host — it blew a 580 s budget before this was sampled + vectorized)."""
    i_a, i_b = np.asarray(i_a), np.asarray(i_b)
    top1 = float((i_a[:, 0] == i_b[:, 0]).mean())
    sa = np.sort(i_a[:sample], axis=1)
    inter = [np.searchsorted(sa[r], i_b[r]) for r in range(sa.shape[0])]
    hits = [(np.take(sa[r], np.clip(p, 0, sa.shape[1] - 1)) == i_b[r]).sum()
            for r, p in enumerate(inter)]
    overlap = float(np.mean(hits) / i_a.shape[1])
    dv = float(np.max(np.abs(np.asarray(v_a) - np.asarray(v_b))))
    return top1, overlap, dv


def make_near_tie(key, n, dim, n_clusters=64, spread=1e-3):
    """Clustered unit embeddings: items within a cluster differ by
    ~``spread`` in cosine score — near-tie-dense by construction. Cluster
    assignment is RANDOM: a round-robin ``arange % n_clusters`` would
    alias every cluster onto 8 of the kernel's 512 bins (g mod 512),
    overflowing the per-bin buffers on every query — a bin-pathology
    stress (covered by the repair tests), not a precision measurement."""
    import jax
    import jax.numpy as jnp

    kc, kn, ka = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_clusters, dim))
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    noise = spread * jax.random.normal(kn, (n, dim)) / np.sqrt(dim)
    x = centers[assign] + noise
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def main():
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import cosine_topk

    assert jax.devices()[0].platform != "cpu", "run this on the chip"
    print(f"device: {jax.devices()[0]}", flush=True)

    for dist in ("gaussian", "near-tie"):
        if dist == "gaussian":
            gallery = jax.random.normal(jax.random.key(0), (GALLERY, DIM))
            queries = jax.random.normal(jax.random.key(1), (QUERIES, DIM))
        else:
            gallery = make_near_tie(jax.random.key(0), GALLERY, DIM)
            # queries drawn the same way: each lands ~1e-3 from ~1500
            # same-cluster gallery rows — the k-th margin is ~the noise
            queries = make_near_tie(jax.random.key(1), QUERIES, DIM)
        jax.block_until_ready(gallery)

        runs = {}
        for prec in ("default", "highest"):
            runs[prec] = cosine_topk(queries, gallery, K, precision=prec)
            jax.block_until_ready(runs[prec])
        # dense path at highest: the fallback contract under 'highest'
        runs["dense_highest"] = cosine_topk(queries, gallery, K,
                                            method="dense",
                                            precision="highest")
        jax.block_until_ready(runs["dense_highest"])

        t1, ov, dv = _agreement(runs["default"][1], runs["highest"][1],
                                runs["default"][0], runs["highest"][0])
        print(f"[{dist}] default-vs-highest: top1 {t1:.4f} "
              f"top{K} overlap {ov:.4f} max|dscore| {dv:.2e}", flush=True)
        t1, ov, dv = _agreement(runs["highest"][1],
                                runs["dense_highest"][1],
                                runs["highest"][0],
                                runs["dense_highest"][0])
        print(f"[{dist}] fused-vs-dense @highest: top1 {t1:.4f} "
              f"top{K} overlap {ov:.4f} max|dscore| {dv:.2e}", flush=True)

        if dist == "gaussian":
            for prec in ("default", "highest"):
                ms = _pipelined_ms(
                    lambda p=prec: cosine_topk(queries, gallery, K,
                                               precision=p))
                print(f"[{dist}] {prec}: {ms:.2f} ms / {QUERIES} queries "
                      f"= {QUERIES / ms * 1e3:,.0f} qps", flush=True)


if __name__ == "__main__":
    main()
