"""End-to-end production serving walkthrough on a synthetic Sketchy tree.

The reference has no serving story — its notebook re-embeds the full
gallery inside every analysis run (inference/training_analysis.ipynb
cell 2). This example shows the framework's replacement, the full
lifecycle a production deployment uses:

1. build a synthetic Sketchy-layout tree (stand-in for the real dataset),
2. embed its sketch gallery once and persist a compact ``GalleryIndex``
   artifact (int8 storage: quarter the bytes of f32),
3. load the artifact and rank ad-hoc query images on device through the
   fused exact top-k kernel (``matmul_dtype='int8'`` serving arithmetic),
4. start the resident HTTP endpoint and answer a live request.

Run (CPU works; on TPU the fused Pallas kernel engages automatically):

    python examples/serving_pipeline.py [--workdir /tmp/serving_demo]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/serving_demo")
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax backend (e.g. cpu for a quick local "
                        "run when the TPU is remote and model init over "
                        "the transport would dominate)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from imageretrievalresearch_tpu.cli.gallery import (
        _make_server,
        build_parser as gallery_parser,
        run as gallery_run,
    )
    from imageretrievalresearch_tpu.cli.inference import (
        build_parser as inference_parser,
        run as inference_run,
    )
    from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree

    # 1. data (replace with the real Sketchy DB-256 root in production)
    tree = make_sketchy_tree(os.path.join(args.workdir, "sketchy"),
                             n_cats=3, n_prods=1, n_photos=8,
                             n_sketches=4, size=args.image_size)
    npz = os.path.join(args.workdir, "gallery.npz")

    # 2. embed + persist the gallery (int8 artifact; pass -cp <ckpt> for a
    #    trained model — architecture/transform get recorded in the meta)
    inference_run(inference_parser().parse_args([
        "-ip", tree, "-mn", "efficientnet_b0",
        "-is", str(args.image_size), "-bs", "8",
        "--save_gallery", npz, "--gallery_dtype", "int8",
    ]))

    # 3. batch query via the CLI surface (JSON lines on stdout).
    #    Serving-mode matrix (PERF.md): float32 (+ --precision highest
    #    for torch-f32 near-tie parity), bfloat16 (half the bytes,
    #    recall@150 = 1.0), int8 (quarter the bytes, fastest), and
    #    int8_rerank (certified two-stage capacity mode: int8 shortlist
    #    + f32-faithful re-rank — top-1 agreement 1.0000 vs true-f32
    #    exact at 1M items, bf16-equal memory; --shortlist sizes stage 1)
    photos = sorted(glob.glob(tree + "/photo/tx_000000000000/*/*"))[:2]
    gallery_run(gallery_parser().parse_args(
        ["query", npz, *photos, "-k", "24", "--num_unique", "2",
         "--matmul_dtype", "int8"]))
    gallery_run(gallery_parser().parse_args(
        ["query", npz, *photos, "-k", "8", "--num_unique", "2",
         "--matmul_dtype", "int8_rerank", "--shortlist", "16"]))

    # 4. resident HTTP endpoint
    srv = _make_server(gallery_parser().parse_args(
        ["serve", npz, "--port", "0", "-k", "24", "--num_unique", "2",
         "--matmul_dtype", "int8"]))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    req = urllib.request.Request(f"{base}/search?num_unique=2",
                                 data=open(photos[0], "rb").read(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        print("HTTP /search ->", json.dumps(json.loads(r.read())),
              file=sys.stderr)
    srv.shutdown()


if __name__ == "__main__":
    main()
