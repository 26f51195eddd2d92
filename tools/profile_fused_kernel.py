"""Per-phase attribution of the fused retrieval kernel (VERDICT r4 task 4)
— run ON THE CHIP: ``python tools/profile_fused_kernel.py``.

PERF.md simultaneously claimed (a) the retuned q512/g512/t6 f32 kernel
streams 4 x 616 MB of gallery in 8.9 ms (~280 GB/s effective) and (b) a
"75-120 GB/s Pallas block DMA" ceiling (round-3, measured PER-CALL — i.e.
including the ~25 ms tunnel RTT that round 4 proved contaminates every
per-call number). At least one is wrong. This tool settles it with
pipelined timing (async back-to-back dispatches, one fence — the bench.py
protocol) on:

1. ablation ladder of the exact production geometry (q512/g512/t6,
   100k x 1536, Q=2048, k=150):
     stream_only   — same grid/BlockSpecs/VMEM budget, body reduces the
                     gallery tile to (QT, 1): the DMA pipeline alone
     matmul_only   — + normalize + MXU matmul, score tile reduced to max
     insert_only   — + the t-depth VPU insertion chain (no extraction)
     full          — the production kernel (ops/retrieval.py)
   The deltas attribute the total into DMA / MXU / insertion / k-pass
   extraction phases (phases overlap — Mosaic double-buffers DMA under
   compute — so deltas are the NON-HIDDEN cost of each phase).
2. a plain Pallas row-block streaming kernel at several block heights —
   the corrected "Pallas block DMA" ceiling;
3. the XLA elementwise r+w stream (the 253 GB/s reference point),
   dependency-chained.

``--trace DIR`` additionally wraps one full-kernel burst in
``jax.profiler.trace`` (perfetto export if supported) for inspection.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GALLERY = 100_000
DIM = 1536
QUERIES = 2048
K = 150
Q_TILE = 512
G_TILE = 512
T_DEPTH = 6


def log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.time()
    print(f"[{time.time() - _t0[0]:7.1f}s] {msg}", flush=True)


def pipelined_ms(call, n_iter=20, repeats=5):
    call(); call()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = None
        for _ in range(n_iter):
            v = call()
        first = v[0] if isinstance(v, tuple) else v
        np.asarray(first[:1, :1])
        times.append(time.perf_counter() - t0)
    return min(times) / n_iter * 1e3


def build_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from imageretrievalresearch_tpu.losses import COSINE_SIM_EPS
    from imageretrievalresearch_tpu.ops.retrieval import _stream_topk_update

    def _round_up(x, m):
        return -(-x // m) * m

    qp = _round_up(QUERIES, Q_TILE)
    gp = _round_up(GALLERY, G_TILE)
    grid = (qp // Q_TILE, gp // G_TILE)

    in_specs = [
        pl.BlockSpec((Q_TILE, DIM), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G_TILE, DIM), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G_TILE, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc_spec = pl.BlockSpec((Q_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)

    # -- stream_only: the DMA pipeline alone (tiles must be consumed or
    # Mosaic dead-code-eliminates the loads; one lane-sum per tile is
    # ~free next to a 512x1536 DMA)
    def stream_kernel(q_ref, g_ref, gnorm_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += (jnp.sum(g_ref[:], axis=1, keepdims=True)
                       + gnorm_ref[:]
                       + jnp.sum(q_ref[:], axis=1, keepdims=True))

    # -- matmul_only: + normalize + MXU matmul (score tile reduced to max)
    def matmul_kernel(q_ref, g_ref, gnorm_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.full_like(acc_ref, -jnp.inf)

        g_hat = g_ref[:] / jnp.maximum(gnorm_ref[:], COSINE_SIM_EPS)
        s = jax.lax.dot_general(
            q_ref[:], g_hat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = jnp.maximum(acc_ref[:],
                                 jnp.max(s, axis=1, keepdims=True))

    # -- insert_only: + the t-depth insertion chain, NO k-pass extraction
    def insert_kernel(q_ref, g_ref, gnorm_ref, vals_out, inds_out, ok_out,
                      bufv_ref, bufi_ref):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            bufv_ref[:] = jnp.full_like(bufv_ref, -jnp.inf)
            bufi_ref[:] = jnp.zeros_like(bufi_ref)

        g_hat = g_ref[:] / jnp.maximum(gnorm_ref[:], COSINE_SIM_EPS)
        s = jax.lax.dot_general(
            q_ref[:], g_hat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        qt, st = s.shape
        bins = bufv_ref.shape[1] // T_DEPTH
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, bins), 1)
        idx = j * st + lane
        sub = jnp.where(idx < GALLERY, s, -jnp.inf)
        cur_v, cur_i = sub, idx
        for t in range(T_DEPTH):
            sl = slice(t * bins, (t + 1) * bins)
            old_v = bufv_ref[:, sl]
            old_i = bufi_ref[:, sl]
            take = cur_v > old_v
            bufv_ref[:, sl] = jnp.where(take, cur_v, old_v)
            bufi_ref[:, sl] = jnp.where(take, cur_i, old_i)
            cur_v = jnp.where(take, old_v, cur_v)
            cur_i = jnp.where(take, old_i, cur_i)

        @pl.when(j == nj - 1)
        def _epilogue():
            # extraction ablated: emit the first k buffer lanes verbatim
            vals_out[:] = bufv_ref[:, :K]
            inds_out[:] = bufi_ref[:, :K]
            ok_out[:] = jnp.ones_like(ok_out)

    # -- full: the production kernel body (normalize + matmul + insertion
    # + k-pass extraction + certificate), same call pattern
    from imageretrievalresearch_tpu.ops.retrieval import _fused_topk_kernel
    full_kernel = functools.partial(_fused_topk_kernel, k=K,
                                    t_depth=T_DEPTH, g_real=GALLERY,
                                    dot_precision=None)

    def make_call(kernel, outs):
        if outs == "acc":
            out_specs, out_shape = acc_spec, jax.ShapeDtypeStruct(
                (qp, 1), jnp.float32)
            scratch = []
        else:
            out_specs = (
                pl.BlockSpec((Q_TILE, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q_TILE, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q_TILE, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            )
            out_shape = (
                jax.ShapeDtypeStruct((qp, K), jnp.float32),
                jax.ShapeDtypeStruct((qp, K), jnp.int32),
                jax.ShapeDtypeStruct((qp, 1), jnp.int32),
            )
            scratch = [
                pltpu.VMEM((Q_TILE, T_DEPTH * G_TILE), jnp.float32),
                pltpu.VMEM((Q_TILE, T_DEPTH * G_TILE), jnp.int32),
            ]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            compiler_params=compiler_params)

    return {
        "stream_only": make_call(stream_kernel, "acc"),
        "matmul_only": make_call(matmul_kernel, "acc"),
        "insert_only": make_call(insert_kernel, "topk"),
        "full": make_call(full_kernel, "topk"),
    }, qp, gp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default=None,
                   help="directory for a jax.profiler trace of one burst")
    p.add_argument("--skip-ceilings", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", "run this on the chip"
    log(f"device {jax.devices()[0]}")

    variants, qp, gp = build_variants()

    key = jax.random.key(0)
    gallery = jax.random.normal(key, (gp, DIM), dtype=jnp.float32)
    queries = jax.random.normal(jax.random.key(1), (qp, DIM),
                                dtype=jnp.float32)
    q_hat = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    gnorm = jnp.linalg.norm(gallery, axis=1)[:, None]
    jax.block_until_ready(gnorm)
    g_bytes = gallery.nbytes
    n_qtiles = qp // Q_TILE
    log(f"gallery {g_bytes / 1e6:.0f} MB, {n_qtiles} q-tiles "
        f"=> {n_qtiles * g_bytes / 1e9:.2f} GB of gallery reads/call")

    results = {}
    for name, call in variants.items():
        jitted = jax.jit(lambda q, g, n, c=call: c(q, g, n))
        ms = pipelined_ms(lambda: jitted(q_hat, gallery, gnorm))
        results[name] = ms
        eff = n_qtiles * g_bytes / (ms / 1e3) / 1e9
        log(f"{name:12s}: {ms:7.2f} ms  "
            f"(effective gallery-stream rate {eff:6.1f} GB/s)")

    full, ins, mm, st = (results["full"], results["insert_only"],
                         results["matmul_only"], results["stream_only"])
    log("--- attribution (non-hidden cost per phase) ---")
    log(f"DMA pipeline        : {st:6.2f} ms")
    log(f"+ normalize+matmul  : {mm - st:6.2f} ms")
    log(f"+ insertion chain   : {ins - mm:6.2f} ms")
    log(f"+ k-pass extraction : {full - ins:6.2f} ms")
    log(f"= full kernel       : {full:6.2f} ms")

    if args.trace:
        with jax.profiler.trace(args.trace):
            c = variants["full"]
            jitted = jax.jit(lambda q, g, n: c(q, g, n))
            v = None
            for _ in range(5):
                v = jitted(q_hat, gallery, gnorm)
            np.asarray(v[0][:1, :1])
        log(f"profiler trace written under {args.trace}")

    if args.skip_ceilings:
        return

    # --- corrected Pallas block-DMA ceiling (pipelined, several heights)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log("--- Pallas row-block stream ceiling (pipelined) ---")
    for rows in (256, 512, 1024, 2048):
        def k(x_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            acc_ref[:] += jnp.sum(x_ref[:], axis=1, keepdims=True)

        call = pl.pallas_call(
            k, grid=(gp // rows,),
            in_specs=[pl.BlockSpec((rows, DIM), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))
        jitted = jax.jit(lambda x, c=call: c(x))
        ms = pipelined_ms(lambda: jitted(gallery))
        log(f"block ({rows:4d}, {DIM}): {ms:6.2f} ms = "
            f"{g_bytes / (ms / 1e3) / 1e9:6.1f} GB/s read")

    # --- XLA elementwise r+w stream reference (dependency-chained)
    @jax.jit
    def xla_stream(x):
        def body(i, x):
            return x * 1.0000001
        return jax.lax.fori_loop(0, 20, body, x)

    jax.block_until_ready(xla_stream(gallery))
    t0 = time.perf_counter()
    jax.block_until_ready(xla_stream(gallery))
    dt = (time.perf_counter() - t0) / 20
    log(f"XLA elementwise r+w stream: {2 * g_bytes / dt / 1e9:6.1f} GB/s "
        f"({dt * 1e3:.2f} ms per 616 MB r+w pass)")


if __name__ == "__main__":
    main()
