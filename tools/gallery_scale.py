"""Gallery capacity demonstration (VERDICT r3 task 3): build and query a
1,000,000 x 1536 int8 GalleryIndex and a 400,000 x 1536 f32 one on the
real chip, recording exact-path qps, certificate/repair behavior, int8
ranking fidelity vs f32, and HBM headroom (PERF.md rows; SURVEY.md:249
names gallery scaling the long-context analog).

Run on the real TPU: ``python -u tools/gallery_scale.py``.

Methodology per CLAUDE.md: two warmups with a forced result fetch, then
min-of-N wall times; queries/classes prepared once so the timed loop is
dispatch + kernel + (Q, k) result fetch — the serving request path.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 1536
QUERIES = 2048
K = 150


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_index(n: int, seed: int, n_classes: int = 125):
    """Host-side gallery of unit-ish gaussian embeddings, chunked adds."""
    from imageretrievalresearch_tpu.retrieval import GalleryIndex

    idx = GalleryIndex(DIM)
    rng = np.random.default_rng(seed)
    chunk = 100_000
    for start in range(0, n, chunk):
        m = min(chunk, n - start)
        e = rng.standard_normal((m, DIM), dtype=np.float32)
        c = rng.integers(0, n_classes, m).astype(np.int32)
        idx.add(e, c)
    return idx


def timed_query(idx, queries, *, matmul_dtype: str, runs: int = 5):
    """qps through GalleryIndex.query (exact path), min-of-N."""
    idx.query(queries[:8], k=K, matmul_dtype=matmul_dtype)   # prepare+compile
    idx.query(queries, k=K, matmul_dtype=matmul_dtype)       # full warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        idx.query(queries, k=K, matmul_dtype=matmul_dtype)
        times.append(time.perf_counter() - t0)
    return QUERIES / min(times), times


def memory_stats():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return {k: stats[k] for k in
                ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                if k in stats}
    except Exception as e:  # remote transports may not expose stats
        return {"unavailable": str(e)}


def certificate_stats(idx, queries):
    """Drive the fused kernel directly to observe the per-row exactness
    certificate at this scale (cosine_topk repairs failures internally;
    here we measure how often that machinery is even needed)."""
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import (
        fused_cosine_topk_pallas,
        l2_normalize,
    )

    g = idx._gallery_on_device("int8")
    codes, scales = g
    q = l2_normalize(jnp.asarray(queries))
    vals, inds, ok = fused_cosine_topk_pallas(q, codes, K,
                                              matmul_dtype="int8",
                                              gallery_scale=scales)
    ok = np.asarray(ok)
    return {"rows": int(ok.size), "certified_exact": int(ok.sum()),
            "repair_rate": float(1.0 - ok.mean())}


def int8_fidelity(idx, queries, n_check: int = 256):
    """int8 ranking vs the f32 exact path on the same 1M gallery."""
    v8, i8, _ = idx.query(queries[:n_check], k=K, matmul_dtype="int8")
    vf, if_, _ = idx.query(queries[:n_check], k=K, matmul_dtype="float32")
    top1 = float((i8[:, 0] == if_[:, 0]).mean())
    overlap = float(np.mean([
        len(set(a) & set(b)) / K for a, b in zip(i8, if_)]))
    return {"top1_match_vs_f32": top1, "top150_overlap_vs_f32": overlap}


def main() -> None:
    rng = np.random.default_rng(99)
    queries = rng.standard_normal((QUERIES, DIM), dtype=np.float32)
    out = {}

    log("building 1M x 1536 index on host...")
    t0 = time.perf_counter()
    idx1m = make_index(1_000_000, seed=1)
    log(f"host build: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    qps_1m_int8, times = timed_query(idx1m, queries, matmul_dtype="int8")
    log(f"1M int8: {qps_1m_int8:.0f} qps (times {times}); "
        f"prepare+upload+bench {time.perf_counter() - t0:.1f}s")
    out["gallery_1m_int8_qps"] = round(qps_1m_int8, 1)
    out["mem_after_1m_int8"] = memory_stats()

    out["fidelity_1m_int8_vs_f32"] = int8_fidelity(idx1m, queries)
    out["certificate_1m_int8"] = certificate_stats(idx1m, queries)
    out["mem_peak_with_f32_checks"] = memory_stats()
    log(f"fidelity: {out['fidelity_1m_int8_vs_f32']}  "
        f"certificate: {out['certificate_1m_int8']}")

    # free the 1M device forms before the 400k f32 build
    idx1m._device_gallery = {}
    idx1m._device_classes = None
    del idx1m

    log("building 400k x 1536 f32 index...")
    idx400 = make_index(400_000, seed=2)
    qps_400k_f32, times = timed_query(idx400, queries,
                                      matmul_dtype="float32")
    log(f"400k f32: {qps_400k_f32:.0f} qps (times {times})")
    out["gallery_400k_f32_qps"] = round(qps_400k_f32, 1)
    out["mem_after_400k_f32"] = memory_stats()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
