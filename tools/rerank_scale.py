"""At-scale (1M x 1536) study of the int8_rerank serving mode (VERDICT r4
task 3) — run ON THE CHIP: ``python tools/rerank_scale.py``.

Measures, against a true-f32-exact reference ranking of the SAME gallery:

1. ranking fidelity of ``int8_rerank_topk`` (top-1 agreement, top-150
   overlap) and its recall-certificate pass rate at 1M items;
2. steady-state throughput (pipelined protocol, bench.py) of the rerank
   mode vs pure int8 — the "within ~1.5x of pure int8" acceptance bound.

HBM discipline on the 16 GB chip: the f32 reference gallery is kept as
FOUR 250k chunks (never concatenated — a (1M, 1536) f32 concat peaks at
12 GB transient) and exact-ranked chunkwise with an offset merge; the
chunks are deleted before the throughput phase. Results recorded in
PERF.md 'int8 -> refined re-rank'.
"""

from __future__ import annotations

import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
CHUNKS = 4
DIM = 1536
QUERIES = 2048
K = 150
OVERLAP_SAMPLE = 512


def log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.time()
    print(f"[{time.time() - _t0[0]:7.1f}s] {msg}", flush=True)


def pipelined_ms(call, n_iter=10, repeats=4):
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


def overlap_frac(i_a, i_b, sample=OVERLAP_SAMPLE):
    i_a, i_b = np.asarray(i_a)[:sample], np.asarray(i_b)[:sample]
    sa = np.sort(i_a, axis=1)
    hits = 0
    for r in range(sa.shape[0]):
        p = np.clip(np.searchsorted(sa[r], i_b[r]), 0, sa.shape[1] - 1)
        hits += int((np.take(sa[r], p) == i_b[r]).sum())
    return hits / (i_a.shape[0] * i_a.shape[1])


def main():
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        int8_rerank_topk,
        pack_codes_int32,
        quantize_rows_int8_residual,
    )

    assert jax.devices()[0].platform != "cpu", "run this on the chip"
    log(f"device {jax.devices()[0]}")

    @jax.jit
    def gen_chunk(key):
        g = jax.random.normal(key, (N // CHUNKS, DIM))
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    queries = jax.random.normal(jax.random.key(1), (QUERIES, DIM))

    # Chunks are generated, quantized, reference-ranked and FREED one at
    # a time: holding all four f32 chunks (6 GB) alongside the codes
    # (3 GB) OOM'd the 16 GB chip once the reference ranking moved to
    # precision='highest' (whose dense-fallback branch reserves more HBM).
    # 'highest' matters for the reference: the default ranking carries
    # ~2.8e-4 of bf16 truncation noise of its own (PERF.md 'Matmul
    # precision'), which the first run of this tool misattributed to the
    # re-rank mode under test (top1 "0.994" vs a default-precision
    # reference, where the refined scores were the MORE faithful side).
    quants, cand_v, cand_i = [], [], []
    g1m = rm = None
    for i in range(CHUNKS):
        ch = gen_chunk(jax.random.key(10 + i))
        qt = quantize_rows_int8_residual(ch)
        jax.block_until_ready(qt[0])
        quants.append(qt[:4])
        g1m = qt[4] if g1m is None else jnp.maximum(g1m, qt[4])
        rm = qt[5] if rm is None else jnp.maximum(rm, qt[5])
        v, idx = cosine_topk(queries, ch, K, precision="highest")
        cand_v.append(v)
        cand_i.append(idx + i * (N // CHUNKS))
        jax.block_until_ready(v)
        del ch, qt
        gc.collect()
        log(f"chunk {i}: generated + quantized + f32-highest ranked")
    c1 = jnp.concatenate([q[0] for q in quants])
    s1 = jnp.concatenate([q[1] for q in quants])
    # residual resident packed, exactly as GalleryIndex serves it
    c2 = pack_codes_int32(jnp.concatenate([q[2] for q in quants]))
    s2 = jnp.concatenate([q[3] for q in quants])
    del quants
    gc.collect()
    jax.block_until_ready(c1)
    log(f"codes resident: {c1.nbytes / 1e9:.2f} + {c2.nbytes / 1e9:.2f} GB")

    cv = jnp.concatenate(cand_v, axis=1)
    ci = jnp.concatenate(cand_i, axis=1)
    mv, mp = jax.lax.top_k(cv, K)
    ref_i = np.asarray(jnp.take_along_axis(ci, mp, axis=1))
    ref_v = np.asarray(mv)
    del cand_v, cand_i, cv, ci, mv, mp
    log("f32 exact reference merged")

    # --- rerank fidelity (certificate bounds on) ---
    for c in (192, 256):
        rv, ri, rmarg = int8_rerank_topk(queries, c1, s1, c2, s2, K,
                                         shortlist=c,
                                         gallery_norm_bound=g1m,
                                         residual_norm_bound=rm)
        jax.block_until_ready(rv)
        ri_np, rv_np = np.asarray(ri), np.asarray(rv)
        m_np = np.asarray(rmarg)
        top1 = float((ri_np[:, 0] == ref_i[:, 0]).mean())
        ov = overlap_frac(ref_i, ri_np)
        dv = float(np.abs(rv_np - ref_v).max())
        log(f"RERANK@{c} vs f32 exact: top1 {top1:.5f} "
            f"top{K} overlap {ov:.5f} max|dscore| {dv:.2e}")
        log(f"  certificate: certified frac {(m_np > 0).mean():.4f}, "
            f"margin p1/p50 {np.percentile(m_np, 1):.4f}/"
            f"{np.percentile(m_np, 50):.4f}")

    # pure int8 fidelity on the same reference (round-4 number re-check)
    iv, ii = cosine_topk(queries, c1, K, matmul_dtype="int8",
                         gallery_scale=s1)
    jax.block_until_ready(iv)
    ii_np = np.asarray(ii)
    log(f"PURE INT8 vs f32 exact: top1 "
        f"{float((ii_np[:, 0] == ref_i[:, 0]).mean()):.5f} "
        f"top{K} overlap {overlap_frac(ref_i, ii_np):.5f}")

    # --- throughput ---
    ms_int8 = pipelined_ms(
        lambda: cosine_topk(queries, c1, K, matmul_dtype="int8",
                            gallery_scale=s1))
    log(f"pure int8 1M: {ms_int8:.2f} ms = {QUERIES / ms_int8 * 1e3:,.0f} "
        "qps")
    for c in (192, 256, 512):
        ms = pipelined_ms(
            lambda c=c: int8_rerank_topk(queries, c1, s1, c2, s2, K,
                                         shortlist=c,
                                         gallery_norm_bound=g1m,
                                         residual_norm_bound=rm))
        log(f"rerank@{c} 1M: {ms:.2f} ms = {QUERIES / ms * 1e3:,.0f} qps "
            f"= {ms / ms_int8:.2f}x pure int8")


if __name__ == "__main__":
    main()
