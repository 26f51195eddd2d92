"""Stage-2 (re-rank) variant bench ON THE CHIP — attributing the gap
between the measured stage-2 cost (~80 ms at 1M/c=256) and the gather
floor (~24 ms, tools/gather_bench.py). Variants:

  gathers_only   — both row gathers + trivial reduce (the floor)
  f32_highest    — production arithmetic: astype(f32) + einsum HIGHEST
  bf16_hilo      — codes as bf16 (ints <=127 are exact), query split into
                   bf16 hi+lo, two DEFAULT einsums per array: f32-faithful
                   to ~1e-7 at 2 MXU passes and half the materialized bytes
  bf16_single    — bf16 codes x bf16-rounded query (quality bound, speed
                   bound)

Each at rerank_block 128 and 512, shortlist c=256 and 512.
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
K = 150


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

    from imageretrievalresearch_tpu.ops.retrieval import (
        _unpack_codes_int32,
        pack_codes_int32,
    )

    assert jax.devices()[0].platform != "cpu"
    log(f"device {jax.devices()[0]}")

    c1 = jax.random.randint(jax.random.key(0), (N, DIM), -127, 128,
                            dtype=jnp.int8)
    c2p = pack_codes_int32(jax.random.randint(
        jax.random.key(1), (N, DIM), -127, 128, dtype=jnp.int8))
    s1 = jax.random.uniform(jax.random.key(2), (N, 1)) / 127
    s2 = s1 / 254
    q = jax.random.normal(jax.random.key(3), (Q, DIM))
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    jax.block_until_ready(c2p)

    def run(variant, c, block):
        idx = jax.random.randint(jax.random.key(4), (Q, c), 0, N)

        # NB: code arrays must be ARGUMENTS (as in int8_rerank_topk), not
        # closure captures — captured they bake 3 GB of constants into
        # the program (first run of this tool hung compiling that)
        @jax.jit
        def go(q, idx, c1, c2p, s1, s2):
            qb = q.reshape(Q // block, block, DIM)
            ib = idx.reshape(Q // block, block, c)

            def one(args):
                qblk, iblk = args
                rows1 = c1[iblk]
                rows2 = _unpack_codes_int32(c2p[iblk])
                sa = s1[iblk][..., 0]
                sb = s2[iblk][..., 0]
                if variant == "gathers_only":
                    return (jnp.sum(rows1.astype(jnp.float32), axis=2)
                            + jnp.sum(rows2.astype(jnp.float32), axis=2)
                            + sa + sb)
                if variant == "f32_highest":
                    d1 = jnp.einsum("bd,bcd->bc", qblk,
                                    rows1.astype(jnp.float32),
                                    precision=jax.lax.Precision.HIGHEST)
                    d2 = jnp.einsum("bd,bcd->bc", qblk,
                                    rows2.astype(jnp.float32),
                                    precision=jax.lax.Precision.HIGHEST)
                    return d1 * sa + d2 * sb
                if variant == "bf16_hilo":
                    r1 = rows1.astype(jnp.bfloat16)
                    r2 = rows2.astype(jnp.bfloat16)
                    qh = qblk.astype(jnp.bfloat16)
                    ql = (qblk - qh.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    def dot(qq, rr):
                        return jnp.einsum(
                            "bd,bcd->bc", qq, rr,
                            preferred_element_type=jnp.float32)
                    return ((dot(qh, r1) + dot(ql, r1)) * sa
                            + (dot(qh, r2) + dot(ql, r2)) * sb)
                if variant == "bf16_single":
                    r1 = rows1.astype(jnp.bfloat16)
                    r2 = rows2.astype(jnp.bfloat16)
                    qh = qblk.astype(jnp.bfloat16)
                    def dot(qq, rr):
                        return jnp.einsum(
                            "bd,bcd->bc", qq, rr,
                            preferred_element_type=jnp.float32)
                    return dot(qh, r1) * sa + dot(qh, r2) * sb
                raise ValueError(variant)

            return jax.lax.map(one, (qb, ib)).reshape(Q, c)

        return pipelined_ms(lambda: go(q, idx, c1, c2p, s1, s2))

    for c in (256, 512):
        for block in (128, 512):
            for variant in ("gathers_only", "f32_highest", "bf16_hilo",
                            "bf16_single"):
                ms = run(variant, c, block)
                log(f"c={c} block={block} {variant:13s}: {ms:8.2f} ms")


if __name__ == "__main__":
    main()
