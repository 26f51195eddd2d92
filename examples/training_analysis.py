"""Script equivalent of the reference's inference/training_analysis.ipynb.

The notebook's flow (cells 0-4): build the test dataloader, load a trained
checkpoint (embedding-only head), embed every (qry, pos, neg) triplet,
rank each query against the full positive-sketch gallery with
``topk(cos, k=150)``, dedup to the first 3 unique classes, report
top1/top3, and render retrieval panels (query + retrieved sketches with
cosine-similarity captions). Here each cell is a framework call:

    python examples/training_analysis.py --ims_path <sketchy_db_256> \
        [--split_json split.json] [--checkpoint ckpt_or_orbax_dir] \
        [--model_name efficientnet_b3a] [--viz_dir analysis_out/] \
        [--gradcam] [--save_gallery gallery.npz]

Works with converted reference checkpoints (torch/Lightning .ckpt via the
on-the-fly converter) or this framework's orbax checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ims_path", required=True)
    p.add_argument("--split_json", default=None)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--model_name", default="efficientnet_b3a")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--topk", type=int, default=150)
    p.add_argument("--viz_dir", default=None)
    p.add_argument("--gradcam", action="store_true",
                   help="overlay retrieval-pair Grad-CAM on the panels")
    p.add_argument("--save_gallery", default=None,
                   help="persist the sketch gallery as a GalleryIndex .npz")
    args = p.parse_args()

    from imageretrievalresearch_tpu.cli.inference import build_eval_transform
    from imageretrievalresearch_tpu.data import (
        SketchyImageDataset,
        TripletLoader,
    )
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.models.convert import load_checkpoint
    from imageretrievalresearch_tpu.retrieval import (
        GalleryIndex,
        RetrievalEngine,
        grad_cam_pair,
        retrieval_grid,
    )

    # cell 1: dataset + loader (test split)
    kw = dict(data_dir=args.ims_path)
    if args.split_json:
        kw.update(trainval_json=args.split_json, trainval="test")
    ds = SketchyImageDataset(load_images=True, **kw)
    dl = TripletLoader(ds, args.batch_size, shuffle=False, num_workers=8)
    print(f"test samples: {len(ds)}, classes: {ds.get_cat_length()}")

    # cell 2: model + checkpoint (embedding-only: the notebook sets
    # model.head = Identity(); `embed` is that surface here)
    backbone = create_model(args.model_name,
                            num_classes=ds.get_cat_length())
    variables = load_checkpoint(
        args.checkpoint, backbone,
        sample_shape=(1, args.input_size, args.input_size, 3))
    engine = RetrievalEngine(
        backbone, variables,
        transform=build_eval_transform("squarepad", args.input_size))

    # cell 2 (cont.): embed + rank + unique-class dedup
    embeds = engine.embed_triplet_loader(
        dl, keep_images=args.viz_dir is not None)
    results = engine.evaluate_class_dedup(embeds, k=args.topk)
    print(f"top1: {results['top1']:.4f}")
    print(f"top3: {results['top3']:.4f}")
    print(f"mean cos(qry, pos): {results['scores']:.4f}")
    print(f"mean cos(qry, neg): {results['neg_scores']:.4f}")

    if args.save_gallery:
        gal = GalleryIndex(embeds["fms_poss_all"].shape[1],
                           meta={"model": args.model_name,
                                 "checkpoint": args.checkpoint})
        gal.add(embeds["fms_poss_all"], embeds["classes_all"])
        gal.save(args.save_gallery)
        print(f"saved {len(gal)}-item gallery to {args.save_gallery}")

    # cell 4: retrieval gallery visualization (+ optional Grad-CAM)
    if args.viz_dir:
        cams = None
        if args.gradcam:
            import numpy as np

            n = min(8, len(results["ims"]))
            q = engine.transform(results["ims"][:n])
            ref = np.asarray(results["fms_poss_all"])[:n]
            cams = np.asarray(grad_cam_pair(backbone, variables, q, ref))
        idx_to_clss = {v: k for k, v in ds.cat_idx.items()}
        paths = retrieval_grid(results, idx_to_clss, args.viz_dir,
                               cams=cams)
        print(f"wrote {len(paths)} panels to {args.viz_dir}")


if __name__ == "__main__":
    main()
