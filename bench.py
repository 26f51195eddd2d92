"""Benchmark: fused gallery retrieval at 100k gallery (BASELINE.json config #5).

Headline metric: retrieval queries/sec through the exact cosine-topk path
(on TPU: the fused Pallas streaming kernel — normalize + MXU matmul +
in-VMEM exact top-k, k=150, notebook ranking semantics) on a 100k x 1536
gallery (efficientnet_b3a embedding dim), measured PIPELINED (back-to-back
async dispatches, one fence — see _pipelined_qps for why: the per-call
protocol of rounds 1-3 spent ~70% of each sample in this sandbox's ~25 ms
tunnel round trip; that legacy figure is still reported as per_call_qps).

``vs_baseline`` = our qps / the reference's eager per-query CPU loop
(torch CosineSimilarity + torch.topk per query, inference semantics of
training_analysis.ipynb cell 2), measured in-process on a query subsample.
BASELINE.json's target is >=10x.

Prints ONE json line:
    {"metric": ..., "value": N, "unit": "queries/sec", "vs_baseline": N}
"""

from __future__ import annotations

import gc
import json
import sys
import time
import traceback

import numpy as np



GALLERY = 100_000
DIM = 1536
QUERIES = 2048
K = 150
REF_MIN_QUERIES = 8    # reference loop: at least this many queries...
REF_MIN_SECONDS = 20.0  # ...and at least this much wall clock (noise floor)

# Canonical baseline denominator (BASELINE.md "Canonical CPU baseline"):
# the reference eager loop measured ONCE under the fixed protocol — 90 s
# window, quiesced 1-core host, 2026-08-19 — so vs_baseline is comparable
# across rounds. The live in-process measurement is still reported
# (reference_cpu_qps_live / vs_baseline_live) but no longer sets the
# headline ratio: it swung 0.92 / 0.98 / 0.30 across rounds 1-3 purely
# with host contention (VERDICT r3 weak #2).
REFERENCE_CPU_QPS_CANONICAL = 0.93


def _wait_for_device(attempts: int = 3, probe_timeout: float = 150.0) -> bool:
    """Return True once device enumeration works; never hang this process.

    First backend init with this sandbox's remote-TPU transport retries
    its connection FOREVER when the tunnel is down — observed as
    ``jax.devices()`` blocking indefinitely, which would hang the
    driver's bench record. Probe enumeration in disposable subprocesses
    with a hard timeout (the tunnel may come back, so retry a few times)
    and only let the parent touch the backend after a probe succeeds.
    """
    import subprocess

    for i in range(attempts):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout)
            if probe.returncode == 0 and probe.stdout.strip():
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: device probe {i + 1}/{attempts} failed; retrying",
              file=sys.stderr, flush=True)
    return False


def _device_embeddings():
    """Random gallery/queries generated ON DEVICE — uploading 600+ MB of
    host arrays through a remote-TPU transport dominates the bench wall
    clock otherwise."""
    import jax

    gallery = jax.random.normal(jax.random.key(0), (GALLERY, DIM))
    queries = jax.random.normal(jax.random.key(1), (QUERIES, DIM))
    jax.block_until_ready(gallery)
    return queries, gallery


def _pipelined_qps(call, *, n_iter: int = 20, repeats: int = 5,
                   queries: int = QUERIES) -> float:
    """Steady-state throughput of an already-jitted retrieval call:
    ``n_iter`` back-to-back ASYNC dispatches, fenced ONCE by fetching a
    corner of the LAST result (device execution is in-order, so the last
    program finishing implies all earlier ones did).

    Why pipelined and not per-call: each synchronous call over this
    sandbox's remote-TPU tunnel carries a fixed ~25 ms dispatch+fetch
    round trip. Measured round 4 (tools/ scaling sweep, n=1..40): total
    time = 25 ms + n x 10.4 ms — i.e. the fused 100k-gallery kernel
    itself takes ~10.4 ms, and every previously recorded per-call figure
    (35-43 ms -> 47-64k qps, including PERF.md's old "30-37 ms
    structural floor") was dominated by the tunnel RTT, which also made
    the recorded headline swing with host contention across rounds. In
    real serving, dispatch overlaps compute — exactly what JAX async
    dispatch does here — so the pipelined figure is the chip-throughput
    number. ``per_call_qps`` is still reported for cross-round
    continuity."""
    call()
    call()                      # warm twice (CLAUDE.md transport rule)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = None
        for _ in range(n_iter):
            v = call()
        np.asarray(v[:1, :1])   # the one reliable fence on this transport
        times.append(time.perf_counter() - t0)
    return queries * n_iter / min(times)


def bench_tpu_retrieval(matmul_dtype: str = "float32",
                        per_call: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import cosine_topk

    queries, gallery = _device_embeddings()
    # serving form (as GalleryIndex keeps it): gallery norms precomputed
    # at build time — recomputing them per call costs one extra full
    # gallery read (round-5 attribution, tools/profile_fused_kernel.py)
    gnorm = jnp.linalg.norm(gallery, axis=1)
    jax.block_until_ready(gnorm)

    def call():
        v, _ = cosine_topk(queries, gallery, K, query_block=512,
                           matmul_dtype=matmul_dtype,
                           gallery_norms=gnorm)
        return v

    if not per_call:
        return _pipelined_qps(call)
    # legacy per-call protocol (rounds 1-3 headline): one fetch per call,
    # so each sample includes the ~25 ms tunnel RTT; min-of-12 because
    # the RTT draw swings run-to-run
    call()
    call()
    times = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(call()[:1, :1])
        times.append(time.perf_counter() - t0)
    return QUERIES / min(times)


def bench_reference_cpu() -> float:
    """The reference's eager loop: per query, torch cos against the full
    gallery + topk (training_analysis.ipynb cell 2 / train/train.py:249-255)."""
    import torch

    rng = np.random.default_rng(0)
    gallery = torch.from_numpy(rng.normal(size=(GALLERY, DIM))
                               .astype(np.float32))
    queries = torch.from_numpy(rng.normal(size=(64, DIM))
                               .astype(np.float32))
    cos = torch.nn.CosineSimilarity(dim=1, eps=1e-6)
    # warm once
    torch.topk(cos(queries[0].unsqueeze(0), gallery), k=K)
    # time-bounded loop: >= REF_MIN_QUERIES queries and >= REF_MIN_SECONDS
    # wall clock, so the baseline denominator isn't a noisy 8-sample spot
    n = 0
    t0 = time.perf_counter()
    with torch.no_grad():
        while True:
            q = queries[n % queries.shape[0]]
            vals, inds = torch.topk(cos(q.unsqueeze(0), gallery), k=K)
            n += 1
            dt = time.perf_counter() - t0
            if n >= REF_MIN_QUERIES and dt >= REF_MIN_SECONDS:
                break
    return n / dt


def bench_tpu_retrieval_bf16() -> float:
    """Serving-resident bf16 mode: the gallery is L2-normalized and cast to
    bf16 ONCE (the documented serving artifact — GalleryIndex
    ``gallery_dtype='bfloat16'`` keeps exactly these bytes resident), then
    queried repeatedly. Rounds 1-4 instead re-normalized + cast the f32
    gallery inside every call, which made the JSON read BELOW f32 (VERDICT
    r4 weak #4) while the real serving mode is the fastest exact path
    after int8."""
    import jax

    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        l2_normalize,
    )

    queries, gallery = _device_embeddings()
    import jax.numpy as jnp

    g_bf16 = l2_normalize(gallery).astype(jnp.bfloat16)
    jax.block_until_ready(g_bf16)

    def call():
        v, _ = cosine_topk(queries, g_bf16, K, matmul_dtype="bfloat16")
        return v

    return _pipelined_qps(call)


def bench_tpu_retrieval_int8() -> float:
    """Serving-resident int8 mode at the headline gallery size: codes +
    scales prepared once (as GalleryIndex keeps them), exact top-k over
    the quantized scores. The fastest serving mode on this chip — beats
    approx_max_k with exact (quantized-score) ranking."""
    import jax

    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        l2_normalize,
        quantize_rows_int8,
    )

    queries, gallery = _device_embeddings()
    codes, scales = quantize_rows_int8(l2_normalize(gallery))
    jax.block_until_ready(codes)

    def call():
        v, _ = cosine_topk(queries, codes, K, matmul_dtype="int8",
                           gallery_scale=scales)
        return v

    return _pipelined_qps(call)


def bench_tpu_retrieval_approx() -> float:
    """Serving-path variant: bf16 matmul + lax.approx_max_k (recall 0.95)."""
    import jax

    from imageretrievalresearch_tpu.ops.retrieval import cosine_topk

    queries, gallery = _device_embeddings()

    def call():
        v, _ = cosine_topk(queries, gallery, K, query_block=2048,
                           method="approx", matmul_dtype="bfloat16")
        return v

    return _pipelined_qps(call)


def bench_embed_throughput(batch: int = 256) -> float:
    """efficientnet_b3a bf16 embedding images/sec/chip (BASELINE metric #1)."""
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.models import create_model

    backbone = create_model("efficientnet_b3a", num_classes=125,
                            dtype=jnp.bfloat16)
    # shape-only init (throughput doesn't depend on parameter values);
    # avoids a slow real init on this host
    var_shapes = jax.eval_shape(
        lambda rng: backbone.init(rng, jnp.zeros((1, 32, 32, 3),
                                                 jnp.bfloat16)),
        jax.random.key(0))
    variables = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), var_shapes)
    x = jax.random.uniform(jax.random.key(2), (batch, 224, 224, 3),
                           dtype=jnp.bfloat16)
    # dependency-chained loop: single-dispatch timing is floored by the
    # ~28 ms remote-dispatch RTT on this transport (CLAUDE.md)
    n_iter = 10

    @jax.jit
    def chain(v, x):
        def body(i, x):
            e = backbone.embed(v, x)
            return x + (e[0, 0] * 0).astype(x.dtype)
        return jax.lax.fori_loop(0, n_iter, body, x)

    r = chain(variables, x)
    np.asarray(r[:1, 0, 0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(variables, x)
        np.asarray(r[:1, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    return batch * n_iter / min(times)


def bench_gallery_1m_int8() -> float:
    """Capacity metric: exact int8 retrieval qps on a 1,000,000 x 1536
    gallery (~1.5 GB codes resident on chip). Embeddings are generated and
    quantized ON DEVICE: the GalleryIndex host path costs ~12 min of
    host->device upload on this ~2 MB/s transport (the full-surface run —
    GalleryIndex build/upload/query + certificate + fidelity — is
    tools/gallery_scale.py, recorded in PERF.md 'Gallery capacity')."""
    import jax

    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        l2_normalize,
        quantize_rows_int8,
    )

    n = 1_000_000
    chunks = []
    # chunked generation: one (1M, 1536) f32 normal + quantize peaks >12 GB
    # of HBM scratch; 250k chunks stay well inside
    for i in range(4):
        g = jax.random.normal(jax.random.key(10 + i), (n // 4, DIM))
        chunks.append(quantize_rows_int8(l2_normalize(g)))
        jax.block_until_ready(chunks[-1])
    import jax.numpy as jnp

    codes = jnp.concatenate([c for c, _ in chunks])
    scales = jnp.concatenate([s for _, s in chunks])
    del chunks
    queries = jax.random.normal(jax.random.key(1), (QUERIES, DIM))

    def call():
        v, _ = cosine_topk(queries, codes, K, matmul_dtype="int8",
                           gallery_scale=scales)
        return v

    # n_iter=10 (not 20): each call streams the full 1.5 GB of codes, so
    # the pipeline is long enough to amortize RTT at 10 already
    return _pipelined_qps(call, n_iter=10)


def bench_gallery_1m_int8_rerank() -> float:
    """Certified-capacity serving metric: ``int8_rerank`` (fused int8
    shortlist -> two-level refined re-rank, VERDICT r4 task 3) qps on a
    1,000,000 x 1536 gallery — top-1 agreement vs true-f32 exact is
    1.0000 at this scale (PERF.md 'int8 -> refined re-rank'). Codes
    generated + quantized on device like :func:`bench_gallery_1m_int8`;
    residual codes resident in the packed-int32 serving form."""
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import (
        int8_rerank_topk,
        l2_normalize,
        pack_codes_int32,
        quantize_rows_int8_residual,
    )

    n = 1_000_000
    quants = []
    for i in range(4):
        g = jax.random.normal(jax.random.key(10 + i), (n // 4, DIM))
        qt = quantize_rows_int8_residual(l2_normalize(g))
        jax.block_until_ready(qt[0])
        quants.append(qt)
    codes = jnp.concatenate([q[0] for q in quants])
    scales = jnp.concatenate([q[1] for q in quants])
    res_codes = pack_codes_int32(jnp.concatenate([q[2] for q in quants]))
    res_scales = jnp.concatenate([q[3] for q in quants])
    g1m = jnp.max(jnp.stack([q[4] for q in quants]))
    rm = jnp.max(jnp.stack([q[5] for q in quants]))
    del quants
    gc.collect()
    queries = jax.random.normal(jax.random.key(1), (QUERIES, DIM))

    def call():
        v, _, _ = int8_rerank_topk(queries, codes, scales, res_codes,
                                   res_scales, K, shortlist=256,
                                   gallery_norm_bound=g1m,
                                   residual_norm_bound=rm)
        return v

    return _pipelined_qps(call, n_iter=10)


def _run_metric(fn, out: dict, key: str, *, retries: int = 0,
                round_to: int = 2, **kw):
    """Run one optional metric; on failure record ``-1.0`` AND the reason.

    Rounds 1-4 used bare ``except Exception: -1.0`` here, which produced
    the round-4 artifact's undiagnosable ``gallery_1m_int8_qps: -1.0``
    (the metric works standalone — VERDICT r4 weak #1). Now every failure
    prints the full traceback to stderr and records the last traceback
    line as ``<key>_error`` in the JSON; transient transport errors get
    ``retries`` more attempts after a device-buffer GC."""
    last = None
    for attempt in range(retries + 1):
        try:
            out[key] = round(fn(**kw), round_to)
            return out[key]
        except Exception as err:  # noqa: BLE001 — the record must survive
            last = err
            traceback.print_exc()
            print(f"bench: {key} attempt {attempt + 1}/{retries + 1} "
                  f"failed: {err!r}", file=sys.stderr, flush=True)
            gc.collect()  # drop dead device buffers before a retry
    out[key] = -1.0
    out[f"{key}_error"] = traceback.format_exception_only(last)[-1].strip()
    return None


def main() -> int | None:
    if not _wait_for_device():
        # One honest JSON line beats hanging the driver forever.
        print(json.dumps({
            "metric": "retrieval_qps_100k_gallery_top150",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "error": "accelerator unreachable (device enumeration timed "
                     "out repeatedly); bench not run",
        }))
        return 1
    ref_qps = bench_reference_cpu()
    qps = bench_tpu_retrieval()
    per_call_qps = bench_tpu_retrieval(per_call=True)
    out: dict = {}
    _run_metric(bench_tpu_retrieval_bf16, out, "exact_bf16_qps")
    _run_metric(bench_tpu_retrieval_approx, out, "approx_path_qps")
    _run_metric(bench_tpu_retrieval_int8, out, "exact_int8_qps")
    _run_metric(bench_embed_throughput, out, "embed_b3a_img_per_sec",
                round_to=1)
    # Free every dead 100k-stage device buffer before the 1.5 GB resident
    # 1M build (the round-4 in-bench failure mode), then allow one retry.
    gc.collect()
    _run_metric(bench_gallery_1m_int8, out, "gallery_1m_int8_qps",
                retries=1, round_to=1)
    gc.collect()   # drop the pure-int8 codes before the two-level build
    _run_metric(bench_gallery_1m_int8_rerank, out,
                "gallery_1m_rerank_qps", retries=1, round_to=1)
    print(json.dumps({
        "metric": "retrieval_qps_100k_gallery_top150",
        # headline = pipelined steady-state (see _pipelined_qps: the old
        # per-call protocol measured mostly tunnel RTT); per_call_qps
        # carries the rounds-1-3 protocol for continuity
        "value": round(qps, 2),
        "unit": "queries/sec",
        # headline ratio uses the PINNED denominator (BASELINE.md canonical
        # protocol) so it is comparable across rounds; the live in-process
        # measurement is reported alongside for drift visibility
        "vs_baseline": round(qps / REFERENCE_CPU_QPS_CANONICAL, 2),
        "per_call_qps": round(per_call_qps, 2),
        **out,
        "reference_cpu_qps_canonical": REFERENCE_CPU_QPS_CANONICAL,
        "reference_cpu_qps_live": round(ref_qps, 4),
        "vs_baseline_live": round(qps / ref_qps, 2),
        # measurement protocol, so cross-round numbers are self-describing
        # (VERDICT r4 task 6): pipelined = back-to-back async dispatches
        # fenced once; galleries serving-resident (bf16 pre-normalized,
        # int8 pre-quantized); fused kernel geometry below
        # v3 (round 5): gallery-side kernel inputs unpadded (Mosaic
        # partial blocks; the pad was a per-call 616 MB copy) and the f32
        # mode scores with build-time-precomputed gallery norms, as served
        "protocol": "pipelined-v3 q512/g512/t6 k150 Q2048 "
                    "nopad prenorm-f32",
    }))


if __name__ == "__main__":
    sys.exit(main())
