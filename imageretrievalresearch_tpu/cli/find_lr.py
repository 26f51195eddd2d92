"""LR-finder CLI — the reference's train/find_lr.py capability.

Runs the exponential LR range test (Lightning tuner equivalent), prints the
suggestion, then optionally trains with it and pickles test results
(train/find_lr.py:435-457).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    from imageretrievalresearch_tpu.cli.train import build_parser as base
    p = base()
    p.description = "LR range test"
    p.add_argument("--min_lr", type=float, default=1e-8)
    p.add_argument("--max_lr", type=float, default=1.0)
    p.add_argument("--num_lr_steps", type=int, default=100)
    p.add_argument("--train_after", action="store_true",
                   help="train with the suggested lr after the sweep")
    return p


def run(args: argparse.Namespace) -> None:
    import jax

    from imageretrievalresearch_tpu.config import TrainConfig
    from imageretrievalresearch_tpu.data import (
        SketchyImageDataset,
        TripletLoader,
    )
    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.train import (
        EmbedTrainState,
        Trainer,
        build_train_step,
        make_optimizer,
    )
    from imageretrievalresearch_tpu.train.lr_finder import lr_find

    cfg_fields = {f for f in TrainConfig.__dataclass_fields__}
    cfg = TrainConfig(**{k: v for k, v in vars(args).items()
                         if k in cfg_fields})
    kw = dict(data_dir=cfg.ims_path, pos_policy=cfg.pos_policy,
              neg_policy=cfg.neg_policy)
    if cfg.split_json:
        kw.update(trainval_json=cfg.split_json, trainval="train")
    ds = SketchyImageDataset(**kw)
    loader = TripletLoader(ds, cfg.batch_size, num_workers=cfg.num_workers,
                           seed=cfg.seed, host_size=cfg.image_size)
    backbone = create_model(cfg.model_name,
                            num_classes=ds.get_cat_length(),
                            dtype=cfg.compute_dtype)
    trainer = Trainer(cfg, backbone, loader)

    def make_state(schedule):
        import jax.numpy as jnp
        tx = make_optimizer(cfg.optimizer_name, schedule, cfg.weight_decay)
        sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3),
                           dtype=cfg.compute_dtype)
        variables = backbone.init(jax.random.key(cfg.seed), sample)
        return EmbedTrainState.from_backbone(backbone, variables, tx)

    step = jax.jit(build_train_step(backbone, cfg))

    def batches():
        for batch in loader:
            yield trainer._prepare(batch, None)

    out = lr_find(make_state, step, batches(), jax.random.key(0),
                  min_lr=args.min_lr, max_lr=args.max_lr,
                  num_steps=args.num_lr_steps)
    print(f"Suggested lr: {out['suggestion']}")
    if args.train_after and out["suggestion"]:
        cfg.learning_rate = out["suggestion"]
        trainer2 = Trainer(cfg, backbone, loader)
        trainer2.fit()


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
