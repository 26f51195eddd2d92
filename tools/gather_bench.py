"""Row-gather micro-benchmark ON THE CHIP — sizing the int8_rerank
stage-2 design. Gathers (Q*c) = 524k rows out of a 1M x 1536 gallery in
8 query blocks (the production shape at shortlist=256) for several
RESIDENT encodings, pipelined timing. Answers: does TPU gather cost
scale with element count or with bytes, and which serving-resident
layout makes the re-rank stage cheap?
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
DIM = 1536
Q = 2048
C = 256
BLOCK = 128


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
        np.asarray(v[:1])
        times.append(time.perf_counter() - t0)
    return min(times) / n_iter * 1e3


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu"
    log(f"device {jax.devices()[0]}")

    idx = jax.random.randint(jax.random.key(0), (Q, C), 0, N)
    blocks = idx.reshape(Q // BLOCK, BLOCK, C)

    def bench(arr, label, elems_per_row):
        @jax.jit
        def run(a, blocks):
            def one(ib):
                rows = a[ib]                       # (BLOCK, C, W)
                return jnp.sum(rows.astype(jnp.float32), axis=(1, 2))
            return jax.lax.map(one, blocks).reshape(-1)

        ms = pipelined_ms(lambda: run(arr, blocks))
        rows = Q * C
        log(f"{label:28s}: {ms:7.2f} ms  "
            f"({rows / ms * 1e3 / 1e6:5.1f} M rows/s, "
            f"{rows * elems_per_row / ms * 1e3 / 1e9:6.2f} G elems/s, "
            f"{arr.dtype.itemsize * rows * elems_per_row / ms * 1e3 / 1e9:6.1f} GB/s)")
        return ms

    g8 = jax.random.randint(jax.random.key(1), (N, DIM), -127, 128,
                            dtype=jnp.int8)
    jax.block_until_ready(g8)
    bench(g8, "int8 (1M,1536)", DIM)

    g32 = jax.lax.bitcast_convert_type(
        g8.reshape(N, DIM // 4, 4), jnp.int32)
    jax.block_until_ready(g32)
    bench(g32, "packed int32 (1M,384)", DIM // 4)
    del g32

    g16 = g8.astype(jnp.int16)
    jax.block_until_ready(g16)
    bench(g16, "int16 (1M,1536)", DIM)
    g16_32 = jax.lax.bitcast_convert_type(
        g16.reshape(N, DIM // 2, 2), jnp.int32)
    jax.block_until_ready(g16_32)
    del g16
    bench(g16_32, "int16->int32 (1M,768)", DIM // 2)
    del g16_32

    gbf = (g8.astype(jnp.float32) / 127).astype(jnp.bfloat16)
    jax.block_until_ready(gbf)
    bench(gbf, "bf16 (1M,1536)", DIM)
    del gbf

    gf = g8.astype(jnp.float32)
    jax.block_until_ready(gf)
    del g8
    bench(gf, "f32 (1M,1536)", DIM)


if __name__ == "__main__":
    main()
