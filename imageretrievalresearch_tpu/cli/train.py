"""Training CLI — flag parity with reference train/train.py:480-498.

Usage (same surface as README.md:100):

    python -m imageretrievalresearch_tpu.cli.train \
        --batch_size 64 --optimizer_name Adam --learning_rate 3e-4 \
        --model_name efficientnet_b3a --ims_path /data/sketchy_database_256

Recipe knobs that the reference hardcoded per script are exposed as extra
flags (--cos_margin / --con_margin / --use_contrastive / --autoaugment),
so T1-T5 are configs of one trainer rather than five scripts.
"""

from __future__ import annotations

import argparse

import yaml


def _bool_or_none(v: str) -> bool | None:
    # the reference used type=bool (always truthy for non-empty strings);
    # we parse properly but accept the same spellings
    if v in ("None", "none", ""):
        return None
    return v not in ("False", "false", "0")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Triplet Loss TPU (JAX) Training Arguments")
    # reference flags (train/train.py:483-495), names/shorthands preserved
    p.add_argument("-ed", "--expdir", default=None,
                   help="Experiment directory")
    p.add_argument("-sp", "--save_path", type=str, default="saved_models",
                   help="Path to save trained models")
    p.add_argument("-bs", "--batch_size", type=int, default=64)
    p.add_argument("-d", "--device", type=str, default="tpu",
                   help="Device (informational; JAX selects the backend)")
    p.add_argument("-ip", "--ims_path", type=str, default="path/to/your/data")
    p.add_argument("-mn", "--model_name", type=str, default="rexnet_150")
    p.add_argument("-on", "--optimizer_name", type=str, default="Adam")
    p.add_argument("-lr", "--learning_rate", type=float, default=4.7863e-03)
    p.add_argument("-wd", "--weight_decay", type=float, default=1e-5)
    p.add_argument("-ofm", "--only_feature_embeddings", type=_bool_or_none,
                   default=True)
    p.add_argument("-otl", "--only_target_labels", type=_bool_or_none,
                   default=True)
    # recipe knobs (hardcoded per reference script)
    p.add_argument("--cos_margin", type=float, default=0.5)
    p.add_argument("--con_margin", type=float, default=0.3)
    p.add_argument("--use_contrastive", action="store_true",
                   help="T3 recipe: add ContrastiveLoss")
    p.add_argument("--autoaugment", action="store_true",
                   help="AutoAugment ImageNetPolicy train transforms (T2/T3)")
    p.add_argument("--split_json", type=str, default=None,
                   help="train/val/test split json (see cli.data_split)")
    p.add_argument("--dataset", type=str, default="sketchy",
                   choices=["sketchy", "original", "soft", "triple",
                            "imagefolder"],
                   help="imagefolder = class-per-subfolder classification "
                        "tree (the T5 recipe's ImageFolder surface, "
                        "train/train_vit_crossentropy.py:50); triple = the "
                        "T4 photo/+sketch/ class-folder triplet layout "
                        "(data/triplet_dataset.py) with a seeded "
                        "--val_fraction holdout")
    p.add_argument("--val_fraction", type=float, default=0.2,
                   help="imagefolder train/val holdout (reference "
                        "random_split 80/20)")
    p.add_argument("--task", type=str, default=None,
                   choices=["triplet", "classification"],
                   help="override the task implied by --dataset "
                        "(imagefolder implies the CE classifier, all "
                        "others the triplet embedder)")
    p.add_argument("--pos_policy", type=str, default="cat")
    p.add_argument("--neg_policy", type=str, default="except_cat")
    p.add_argument("--sketch_qry", action="store_true",
                   help="sketches become queries too (sketchy layout)")
    p.add_argument("--pos_return_num", type=int, default=1)
    p.add_argument("--neg_return_num", type=int, default=1)
    p.add_argument("--use_native_loader", action="store_true",
                   help="decode batches with the C++ loader (native/)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="multi-host: jax.distributed coordinator "
                        "host:port (set with --num_processes/--process_id;"
                        " on TPU pods the three can usually be omitted "
                        "and auto-detected by passing --num_processes -1)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("-c", "--cache", action="store_true",
                   help="decode-once RAM cache at host size (the "
                        "reference's inference cache flag, applied to "
                        "training): on a decode-bound host this makes "
                        "steady-state epochs device-bound")
    p.add_argument("--host_size", type=int, default=None,
                   help="host-side decode size (default: image_size). Set "
                        "to the source resolution (e.g. 256 for Sketchy) to "
                        "defer the final resize to the device's antialiased "
                        "path")
    p.add_argument("--recipe", type=str, default=None,
                   help="named preset (T1-T6): "
                        "train / train_efficientnet / "
                        "train_efficient_cos_con_ce_loss / train_vit_triplet"
                        " / train_vit_crossentropy / find_lr")
    p.add_argument("--max_epochs", type=int, default=300)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--param_sharding", type=str, default="replicated",
                   choices=("replicated", "fsdp"),
                   help="state layout over the device mesh: replicated "
                        "(DDP-style, the reference's strategy) or fsdp "
                        "(ZeRO-3: params+optimizer sharded over the data "
                        "axis, ~1/n_devices state bytes per chip)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--wandb", action="store_true")
    return p


# one shared TripleDataset decode cache per (tree, cache_size), replaced
# when the key changes so one stale tree's decoded images never accumulate
# across runs in the same process (previously smuggled through the argparse
# Namespace — hidden mutable state on a value object)
_TRIPLE_CACHE: dict = {"key": None, "store": None}


def _shared_triple_store(ims_path: str, cache_size) -> dict:
    import os as _os
    key = (_os.path.abspath(ims_path), cache_size)
    if _TRIPLE_CACHE["key"] != key:
        _TRIPLE_CACHE["key"] = key
        _TRIPLE_CACHE["store"] = {}
    return _TRIPLE_CACHE["store"]


def build_dataset(cfg, args, split: str):
    """One dataset for ``split`` ("train"/"val"/"test") per the configured
    ``cfg.dataset`` family — shared by the train and find_lr CLIs so every
    ``--dataset`` choice behaves identically in both. Returns None when the
    family has no such split (sketchy-family val/test without
    ``--split_json``; imagefolder/triple have no test split)."""
    import os

    from imageretrievalresearch_tpu.data import (
        ImageFolderDataset,
        OriginalImageDataset,
        SketchyImageDataset,
        TripleDataset,
        TripletImageDataset,
    )

    cache_kw = (dict(load_images=True,
                     cache_size=args.host_size or cfg.image_size)
                if args.cache else {})
    if cfg.dataset == "imagefolder":
        # T5 surface: any class-per-subfolder tree, seeded 80/20 holdout
        # (reference ImageFolder + random_split,
        # train/train_vit_crossentropy.py:50,59)
        if split == "test":
            return None
        return ImageFolderDataset(data_dir=cfg.ims_path, split=split,
                                  val_fraction=cfg.val_fraction,
                                  seed=cfg.seed, **cache_kw)
    if cfg.dataset == "triple":
        # T4 surface: <ims_path>/photo/<class>/* + <ims_path>/sketch/<class>/*
        # (reference train/train_vit_triplet.py:17,52 — TripleDataset with a
        # random train/val holdout, here seeded)
        if split == "test":
            return None
        if args.cache:
            # TripleDataset's sketch universe is split-independent (pos/neg
            # drawn by class): share ONE decode cache across the CLI's
            # train/val instances so the tree is decoded + held once
            cache_kw["cache_store"] = _shared_triple_store(
                cfg.ims_path, cache_kw["cache_size"])
        return TripleDataset(
            photo_root=os.path.join(cfg.ims_path, "photo"),
            sketch_root=os.path.join(cfg.ims_path, "sketch"),
            seed=cfg.seed, split=split, val_fraction=cfg.val_fraction,
            **cache_kw)
    ds_cls = {"sketchy": SketchyImageDataset,
              "original": OriginalImageDataset,
              "soft": TripletImageDataset}[cfg.dataset]
    if split != "train" and not cfg.split_json:
        return None
    kw = dict(data_dir=cfg.ims_path, pos_policy=cfg.pos_policy,
              neg_policy=cfg.neg_policy, **cache_kw)
    if cfg.dataset == "sketchy" and getattr(args, "sketch_qry", False):
        kw["sketch_qry"] = True
    if getattr(args, "pos_return_num", 1) != 1:
        kw["pos_return_num"] = args.pos_return_num
    if getattr(args, "neg_return_num", 1) != 1:
        kw["neg_return_num"] = args.neg_return_num
    if cfg.split_json:
        kw.update(trainval_json=cfg.split_json, trainval=split)
    return ds_cls(**kw)


def build_loader(cfg, args, ds, kind: str = "train"):
    """Loader with the per-split conventions both CLIs share: train
    shuffles and drops the remainder; imagefolder/triple validation mirrors
    the reference's random_split DataLoaders (shuffle=False, drop_last=False,
    train_vit_crossentropy.py:63, train_vit_triplet.py:52) so eval order is
    deterministic and the partial final batch is scored exactly (unsharded
    remainder path in Trainer._eval_batches); test keeps every item."""
    import jax

    from imageretrievalresearch_tpu.data import TripletLoader

    seed_offset = {"train": 0, "val": 1, "test": 2}[kind]
    if kind == "train":
        conv = dict(shuffle=True, drop_last=True)
    elif kind == "test":
        conv = dict(shuffle=False, drop_last=False)
    else:
        conv = (dict(shuffle=False, drop_last=False)
                if cfg.dataset in ("imagefolder", "triple")
                else dict(shuffle=True, drop_last=True))
    return TripletLoader(ds, cfg.batch_size, num_workers=cfg.num_workers,
                         seed=cfg.seed + seed_offset,
                         host_size=args.host_size or cfg.image_size,
                         use_native=args.use_native_loader,
                         process_index=jax.process_index(),
                         process_count=jax.process_count(), **conv)


def init_distributed(args: argparse.Namespace) -> None:
    """multi-host DP bring-up from the shared CLI flags — must run before
    any jax backend use (SURVEY.md §2 "host data loading sharded
    per-process"); with all three flags None on a TPU pod jax auto-detects
    from the metadata server. Shared by the train and find_lr CLIs."""
    if not (args.coordinator_address or args.num_processes
            or args.process_id is not None):
        return
    import jax

    kw = {}
    if args.coordinator_address:
        kw["coordinator_address"] = args.coordinator_address
    if args.num_processes and args.num_processes > 0:
        kw["num_processes"] = args.num_processes
    if args.process_id is not None:
        kw["process_id"] = args.process_id
    jax.distributed.initialize(**kw)
    print(f"[distributed] process {jax.process_index()} of "
          f"{jax.process_count()}, {len(jax.local_devices())} local / "
          f"{len(jax.devices())} global devices")


def build_config(args: argparse.Namespace, parser_defaults: dict):
    """TrainConfig from CLI args, honoring ``--recipe`` presets: explicit
    CLI values override the preset; untouched argparse defaults do not.
    Shared by the train and find_lr CLIs."""
    from imageretrievalresearch_tpu.config import TrainConfig

    cfg_fields = {f for f in TrainConfig.__dataclass_fields__}
    overrides = {k: v for k, v in vars(args).items() if k in cfg_fields}
    if getattr(args, "recipe", None):
        from imageretrievalresearch_tpu.recipes import make_config
        explicit = {k: v for k, v in overrides.items()
                    if parser_defaults.get(k) != v}
        return make_config(args.recipe, **explicit)
    return TrainConfig(**overrides)


def run(args: argparse.Namespace) -> None:
    # heavy imports deferred so --help is instant
    init_distributed(args)
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.train import Trainer
    from imageretrievalresearch_tpu.utils.logging import MetricLogger
    import os

    argstr = yaml.dump(vars(args), default_flow_style=False)
    print(f"\nTraining Arguments:\n{argstr}")

    cfg = build_config(args, vars(build_parser().parse_args([])))
    tr_ds = build_dataset(cfg, args, "train")
    val_ds = build_dataset(cfg, args, "val")
    num_classes = tr_ds.get_cat_length()
    if cfg.effective_task != "classification" and cfg.loss_mode == "ce_only":
        # ce_only targets PRODUCT labels (reference train.py:236-241 uses
        # `regs`), so the head must be product-sized. The reference sizes
        # every head by cat count (train.py:64), which torch rejects loudly
        # ("Target out of bounds") the moment prods > cats — under jit the
        # same gather silently yields NaN loss, so we implement the intent
        # instead of the crash.
        prod_classes = getattr(tr_ds, "get_prod_length", tr_ds.get_cat_length)()
        if prod_classes != num_classes:
            print(f"[train] ce_only trains on product labels: classifier "
                  f"head sized {prod_classes} (products), not "
                  f"{num_classes} (categories)")
            num_classes = prod_classes
    print(f"Number of train set images: {len(tr_ds)}")
    if val_ds:
        print(f"Number of validation set images: {len(val_ds)}")
    print(f"\nTrain dataset has {num_classes} classes")

    train_loader = build_loader(cfg, args, tr_ds, "train")
    val_loader = (build_loader(cfg, args, val_ds, "val")
                  if val_ds else None)

    save_name = f"{cfg.model_name}_{cfg.optimizer_name}_{cfg.learning_rate}"
    cfg.checkpoint_dir = os.path.join(cfg.save_path, save_name)
    backbone = create_model(cfg.model_name, num_classes=num_classes,
                            dtype=cfg.compute_dtype)
    import jax
    logger = MetricLogger(
        # only process 0 owns the jsonl file (N processes opening 'a' on a
        # shared filesystem is pointless churn; log() is main-gated anyway)
        cfg.checkpoint_dir if jax.process_index() == 0 else None,
        use_wandb=cfg.wandb, run_name=save_name,
        log_every_n_steps=cfg.log_every_n_steps)
    trainer = Trainer(cfg, backbone, train_loader, val_loader, logger=logger)
    trainer.fit()


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
