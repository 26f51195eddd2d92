"""On-chip exact-retrieval latency at serving batch sizes (Q=1/8/64/256).

bench.py ranks Q=2048; the serve endpoint embeds ONE image per POST. The
fused kernel pads queries to q_tile=256, so small Q may pay the full
Mosaic grid floor (~30-37 ms, PERF.md) regardless. This sweep measures,
per Q, the exact-path variants a server could dispatch:

- fused (default q_tile=256),
- fused with a Q-sized q_tile (8-aligned),
- the dense blocked path (matmul + chunked two-stage top-k),
- lax.approx_max_k (serving recall ~0.95, for context).

Timing per CLAUDE.md: gallery generated ON device (no 600 MB upload over
the ~60 MB/s tunnel), two warmups + forced fetch, then a
dependency-chained fori_loop(20) divided by 20 (single-op timings are
floored by the ~28 ms dispatch RTT).

Run on the real TPU:  python tools/serving_latency.py [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K = 150


def _chained(fn, iters: int):
    """iters dependent calls of fn(q, g) -> (vals, inds): each iteration's
    queries depend on the previous ranking so XLA cannot overlap or elide
    them."""
    import jax

    def run(q, g):
        def body(_, qc):
            vals, _i = fn(qc, g)
            return qc + vals[:, :1] * 1e-30
        return jax.lax.fori_loop(0, iters, body, q)

    return jax.jit(run)


def time_variant(name: str, fn, q, g, iters: int) -> float:
    """ms per call (chained loop / iters) after warmup."""
    import jax

    chained = _chained(fn, iters)
    for _ in range(2):                       # warmup: compile + first exec
        np.asarray(chained(q, g))            # forced fetch (CLAUDE.md)
    t0 = time.perf_counter()
    jax.block_until_ready(chained(q, g))
    ms = (time.perf_counter() - t0) * 1000 / iters
    print(f"  {name:24s} {ms:8.2f} ms")
    return ms


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--qs", type=int, nargs="+", default=[1, 8, 64, 256])
    p.add_argument("--gallery", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1536)
    p.add_argument("--iters", type=int, default=20,
                   help="dependency-chained calls per timing")
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode — CPU smoke runs only "
                        "(numbers are meaningless off-chip)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        fused_cosine_topk_pallas,
        l2_normalize,
    )

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    k = min(K, args.gallery)
    it = args.iters
    key = jax.random.key(0)
    g = l2_normalize(jax.random.normal(key, (args.gallery, args.dim),
                                       jnp.float32))
    g = jax.block_until_ready(g)

    results = {}
    for q_n in args.qs:
        print(f"Q={q_n}:")
        q = l2_normalize(jax.random.normal(jax.random.key(q_n + 1),
                                           (q_n, args.dim), jnp.float32))
        q = jax.block_until_ready(q)
        row = {}

        row["fused_qtile256"] = time_variant(
            "fused q_tile=256",
            lambda qc, gc: cosine_topk(qc, gc, k, method="fused",
                                       interpret=args.interpret), q, g, it)

        qt = max(8, -(-q_n // 8) * 8)
        if qt < 256:
            def fused_small(qc, gc, qt=qt):
                vals, inds, _ok = fused_cosine_topk_pallas(
                    qc, gc, k, q_tile=qt, interpret=args.interpret)
                return vals, inds
            row[f"fused_qtile{qt}"] = time_variant(
                f"fused q_tile={qt}", fused_small, q, g, it)

        row["dense"] = time_variant(
            "dense blocked",
            lambda qc, gc: cosine_topk(qc, gc, k, method="dense"), q, g, it)

        row["approx"] = time_variant(
            "approx_max_k",
            lambda qc, gc: cosine_topk(qc, gc, k, method="approx"), q, g, it)

        results[q_n] = row

    txt = json.dumps(results, indent=2)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
