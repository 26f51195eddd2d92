"""Inference CLI — flag parity with reference inference/inference.py:265-274.

Runs the *working* retrieval-eval path (the reference script's own dataset
import is broken — SURVEY.md §0; the behavior implemented here is the
notebook path of training_analysis.ipynb cell 2, with the script's
index-match metric available via --topk_variant index_match).
"""

from __future__ import annotations

import argparse

import yaml


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Inference Arguments")
    p.add_argument("-ip", "--im_path", type=str, default="data",
                   help="Images directory")
    p.add_argument("-cp", "--checkpoint_path", type=str, default="",
                   help="Path to the trained model checkpoint")
    p.add_argument("-mn", "--model_name", type=str, default="rexnet_150")
    p.add_argument("-is", "--input_size", type=int, default=224)
    p.add_argument("-bs", "--batch_size", type=int, default=256)
    p.add_argument("-d", "--device", type=str, default="tpu")
    p.add_argument("-c", "--cache", type=lambda v: v not in ("False", "0"),
                   default=True, help="Preload/decode-cache images")
    p.add_argument("--conv_input", action="store_true",
                   help="prepend the 3x3 conv + SiLU stem "
                        "(inference.py:101-105)")
    p.add_argument("--split_json", type=str, default=None)
    p.add_argument("--topk_variant", type=str, default="class_dedup",
                   choices=["class_dedup", "index_match"])
    p.add_argument("--viz_dir", type=str, default=None,
                   help="write retrieval visualization grids here")
    return p


def run(args: argparse.Namespace) -> None:
    import jax
    import jax.numpy as jnp

    from imageretrievalresearch_tpu.data import (
        SketchyImageDataset,
        TripletLoader,
    )
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint
    from imageretrievalresearch_tpu.retrieval import (
        RetrievalEngine,
        retrieval_grid,
    )

    argstr = yaml.dump(vars(args), default_flow_style=False)
    print(f"\nInference Arguments:\n{argstr}\n")

    kw = dict(data_dir=args.im_path)
    if args.split_json:
        kw.update(trainval_json=args.split_json, trainval="test")
    ds = SketchyImageDataset(load_images=args.cache, **kw)
    num_classes = ds.get_cat_length()
    print(f"The dataset has {num_classes} classes")
    print(f"Number of test samples: {len(ds)}")
    dl = TripletLoader(ds, args.batch_size, shuffle=True, drop_last=True,
                       num_workers=8, host_size=args.input_size)

    backbone = create_model(args.model_name, num_classes=num_classes,
                            conv_input=args.conv_input)
    variables = load_checkpoint(args.checkpoint_path, backbone,
                                sample_shape=(1, args.input_size,
                                              args.input_size, 3))
    transform = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)
    engine = RetrievalEngine(backbone, variables, transform=transform)

    keep = args.viz_dir is not None
    embeds = engine.embed_triplet_loader(dl, keep_images=keep)
    if args.topk_variant == "index_match":
        results = engine.evaluate_index_match(embeds)
        print(f"\nTest loss: {results['loss']:.3f}")
    else:
        results = engine.evaluate_class_dedup(embeds)
    print(f"Test top1: {results['top1']:.3f}")
    print(f"Test top3: {results['top3']:.3f}")
    print(f"Test cos sim scores: {results['scores']:.3f}")
    if args.viz_dir:
        idx_to_clss = {v: k for k, v in ds.cat_idx.items()}
        paths = retrieval_grid(results, idx_to_clss, args.viz_dir)
        print(f"Wrote {len(paths)} visualization grids to {args.viz_dir}")


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
