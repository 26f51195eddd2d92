"""Gallery serving CLI — query a saved :class:`GalleryIndex` artifact.

The build side lives in the inference CLI (``cli.inference --save_gallery``:
embed a dataset's sketch gallery once, persist as one ``.npz``). This CLI is
the serving side the reference lacks entirely (its notebook re-embeds the
full gallery per analysis run, training_analysis.ipynb cell 2): load the
artifact, embed ad-hoc query images, rank on device, print results.

Subcommands:

- ``info``   — print an artifact's size / dim / metadata.
- ``query``  — embed image files (or a directory) with the artifact's
  recorded model + transform and print per-query rankings as JSON lines.

Ranking semantics follow the reference notebook (``topk(cos, k)`` +
optional unique-class dedup); ``--matmul_dtype bfloat16`` selects the
half-memory single-MXU-pass serving mode (PERF.md).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GalleryIndex serving CLI")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("info", help="describe a gallery artifact")
    pi.add_argument("gallery", type=str, help="GalleryIndex .npz path")

    pq = sub.add_parser("query", help="rank the gallery for query images")
    pq.add_argument("gallery", type=str, help="GalleryIndex .npz path")
    pq.add_argument("images", nargs="+", type=str,
                    help="query image files and/or directories")
    pq.add_argument("-cp", "--checkpoint_path", type=str, default="",
                    help="model checkpoint (default: the artifact's "
                         "recorded checkpoint)")
    pq.add_argument("-mn", "--model_name", type=str, default=None,
                    help="backbone (default: the artifact's recorded model)")
    pq.add_argument("-is", "--input_size", type=int, default=None)
    pq.add_argument("-bs", "--batch_size", type=int, default=64)
    pq.add_argument("-k", "--topk", type=int, default=150)
    pq.add_argument("--num_unique", type=int, default=3,
                    help="unique classes reported after dedup (notebook "
                         "cell 2 semantics); 0 disables dedup")
    pq.add_argument("--method", type=str, default="exact",
                    choices=["exact", "approx"])
    pq.add_argument("--matmul_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="bfloat16/int8 = half/quarter gallery bytes, "
                         "exact top-k of the rounded/quantized scores")
    pq.add_argument("--transform", type=str, default=None,
                    choices=["squarepad", "plain"],
                    help="eval transform (default: the artifact's recorded "
                         "transform)")
    pq.add_argument("--host_size", type=int, default=None,
                    help="host-side decode resize; required when query "
                         "images have mixed source resolutions")
    return p


def _collect_images(specs: list[str]) -> list[Path]:
    out: list[Path] = []
    for spec in specs:
        path = Path(spec)
        if path.is_dir():
            out.extend(sorted(q for q in path.rglob("*")
                              if q.suffix.lower() in _IMG_EXTS))
        elif path.is_file():
            out.append(path)
        else:
            raise FileNotFoundError(spec)
    if not out:
        raise ValueError(f"no images found under {specs}")
    return out


def _decode(paths: list[Path], host_size: int | None):
    import numpy as np
    from PIL import Image

    arrs = []
    for p in paths:
        with Image.open(p) as im:
            im = im.convert("RGB")
            if host_size:
                im = im.resize((host_size, host_size), Image.BILINEAR)
            arrs.append(np.asarray(im, np.uint8))
    shapes = {a.shape for a in arrs}
    if len(shapes) > 1:
        raise SystemExit(
            f"query images have mixed resolutions {sorted(shapes)}; pass "
            "--host_size to resize on host before stacking")
    return np.stack(arrs)


def run(args: argparse.Namespace) -> None:
    from imageretrievalresearch_tpu.retrieval import GalleryIndex

    if args.cmd == "info":
        idx = GalleryIndex.load(args.gallery)
        print(json.dumps({"items": len(idx), "dim": idx.dim,
                          "classes": int(idx.classes.max()) + 1
                          if len(idx) else 0,
                          "meta": idx.meta}, indent=2))
        return

    import numpy as np

    from imageretrievalresearch_tpu.cli.inference import build_eval_transform
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint

    idx = GalleryIndex.load(args.gallery)
    meta = idx.meta
    model_name = args.model_name or meta.get("model") or "efficientnet_b3a"
    ckpt = args.checkpoint_path or meta.get("checkpoint") or ""
    transform = args.transform or meta.get("transform") or "squarepad"
    input_size = args.input_size or meta.get("input_size") or 224

    paths = _collect_images(args.images)
    print(f"{len(paths)} query images | gallery: {len(idx)} items, "
          f"dim {idx.dim}, model {model_name}", file=sys.stderr)

    backbone = create_model(model_name, num_classes=1)
    # keep stdout a pure JSON-lines stream — loader chatter goes to stderr
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        variables = load_checkpoint(ckpt, backbone,
                                    sample_shape=(1, input_size,
                                                  input_size, 3))
    tfm = build_eval_transform(transform, input_size)

    import jax

    embed = jax.jit(lambda v, x: backbone.embed(v, x, train=False))
    embeds = []
    for i in range(0, len(paths), args.batch_size):
        x = _decode(paths[i:i + args.batch_size], args.host_size)
        embeds.append(np.asarray(embed(variables, tfm(x))))
    queries = np.concatenate(embeds)

    kw = dict(method=args.method, matmul_dtype=args.matmul_dtype)
    if args.num_unique:
        inds, vals, classes = idx.query_class_dedup(
            queries, k=args.topk, num_unique=args.num_unique, **kw)
    else:
        vals, inds, classes = idx.query(queries, k=args.topk, **kw)
    gpaths = idx.paths
    for qi, qpath in enumerate(paths):
        # dedup pads with -1/-inf when fewer than num_unique classes exist
        # within the top-k candidates — drop the filler from served output
        keep = [int(g) >= 0 for g in inds[qi]]
        ginds = [int(g) for g, m in zip(inds[qi], keep) if m]
        print(json.dumps({
            "query": str(qpath),
            "indices": ginds,
            "scores": [round(float(v), 5)
                       for v, m in zip(vals[qi], keep) if m],
            "classes": [int(c) for c, m in zip(classes[qi], keep) if m],
            "paths": [gpaths[g] for g in ginds] if any(gpaths) else None,
        }))


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
