"""HTTP serving benchmark: qps + latency percentiles on the real chip.

Measures the resident gallery endpoint (cli/gallery.py serve) end-to-end
— decode, micro-batched embed + rank dispatches, JSON response — at
client concurrency 1 and 8, reporting p50/p99 latency and qps. This is
the serving number PERF.md was missing (its 421-483 ms figures are
transport-dominated single-batch validation runs, not a server under
load).

Run on the real TPU:  python tools/serve_bench.py [--out f.json]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_artifact(workdir: str, *, n_items: int = 256, size: int = 224
                   ) -> str:
    """A gallery artifact from synthetic images embedded on the chip."""
    from PIL import Image

    from imageretrievalresearch_tpu.data.synthetic import _class_base

    # keyed by BOTH knobs: a rerun with a different --n_items must not
    # silently reuse (and mislabel) a stale gallery
    npz = os.path.join(workdir, f"gal_{size}_{n_items}.npz")
    if os.path.exists(npz):          # incremental reruns skip ALL build work
        return npz

    # image tree keyed the same way — the gallery build walks the whole
    # tree, so leftovers from a different-sized run must not leak in
    root = os.path.join(workdir, f"gallery_imgs_{size}_{n_items}")
    rng = np.random.default_rng(0)
    for i in range(n_items):
        c, p = i % 8, (i // 8) % 2
        base = _class_base(c, p, size)
        arr = np.clip(base + rng.normal(0, 28.0, base.shape),
                      0, 255).astype(np.uint8)
        d = os.path.join(root, f"class{c}")
        os.makedirs(d, exist_ok=True)
        Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))

    from imageretrievalresearch_tpu.cli.gallery import build_parser, run
    t0 = time.perf_counter()
    run(build_parser().parse_args(
        ["build", npz, root, "-mn", "efficientnet_b0", "-is", str(size),
         "-bs", "64", "--gallery_dtype", "int8"]))
    print(f"build: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    return npz


def run_load(base: str, body: bytes, *, concurrency: int, seconds: float
             ) -> dict:
    latencies: list[float] = []
    lock = threading.Lock()
    stop = time.perf_counter() + seconds
    errors = [0]

    def client():
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(base + "/search", data=body,
                                             method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    r.read()
            except Exception:  # noqa: BLE001
                with lock:
                    errors[0] += 1
                continue
            with lock:
                latencies.append((time.perf_counter() - t0) * 1000)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = np.asarray(latencies)
    return {
        "concurrency": concurrency,
        "requests": len(lat),
        "errors": errors[0],
        "qps": round(len(lat) / wall, 2),
        # every request can error in a window (server wedged): report the
        # counts rather than crash on an empty percentile
        "p50_ms": round(float(np.percentile(lat, 50)), 1) if len(lat) else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 1) if len(lat) else None,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/serve_bench")
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--n_items", type=int, default=256,
                   help="gallery size (smaller for CPU smoke runs)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax

    from imageretrievalresearch_tpu.cli.gallery import (
        _make_server,
        build_parser,
    )

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    os.makedirs(args.workdir, exist_ok=True)
    npz = build_artifact(args.workdir, n_items=args.n_items,
                         size=args.size)

    srv = _make_server(build_parser().parse_args(
        ["serve", npz, "--port", "0", "-k", "50", "--num_unique", "3",
         "--matmul_dtype", "int8", "--max_batch", "4"]))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    from PIL import Image

    from imageretrievalresearch_tpu.data.synthetic import _class_base
    img = np.clip(_class_base(3, 0, args.size)
                  + np.random.default_rng(9).normal(0, 28.0,
                                                    (args.size, args.size,
                                                     3)),
                  0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG")
    body = buf.getvalue()

    # warm every compiled program up front (pow2 embed shapes are distinct
    # XLA programs; compiles over the remote transport cost ~minutes and
    # must not land inside the timed window)
    t0 = time.perf_counter()
    for n in (1, 2, 4):
        srv.batcher.search_fn(
            np.zeros((n, args.size, args.size, 3), np.uint8), 3)
        print(f"  warmed batch {n}: {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    for _ in range(2):
        req = urllib.request.Request(base + "/search", data=body,
                                     method="POST")
        urllib.request.urlopen(req, timeout=300).read()
    print(f"warmup: {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    results = {"gallery_items": args.n_items, "image_size": args.size,
               "matmul_dtype": "int8"}
    for conc in (1, 8):
        # snapshot the monotonic batcher counters so each round reports
        # ITS OWN coalescing ratio, not cumulative totals incl. warmup
        req0, dis0 = srv.batcher.requests, srv.batcher.dispatches
        r = run_load(base, body, concurrency=conc, seconds=args.seconds)
        r["batcher"] = {"requests": srv.batcher.requests - req0,
                        "dispatches": srv.batcher.dispatches - dis0}
        results[f"concurrency_{conc}"] = r
        print(json.dumps(r), file=sys.stderr)
    srv.shutdown()
    srv.server_close()

    txt = json.dumps(results, indent=2)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
