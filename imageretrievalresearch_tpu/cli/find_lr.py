"""LR-finder CLI — the reference's train/find_lr.py capability.

Runs the exponential LR range test (Lightning tuner equivalent,
train/find_lr.py:435-436), prints the suggestion, then optionally trains
with it (``--train_after``): the find_lr recipe logs its validation
``cos_sims`` through the score booster (train/find_lr.py:87-95,337) and
pickles test results with the reference's keys (train/find_lr.py:440-457).

The sweep runs the SAME fused transform+train-step dispatch the Trainer
uses (raw uint8 loader batches are float-transformed inside the jitted
step), so the suggested lr reflects real training arithmetic.
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


def run(args: argparse.Namespace) -> dict:
    import functools
    import os

    from imageretrievalresearch_tpu.cli.train import (
        build_config,
        build_dataset,
        build_loader,
        init_distributed,
    )

    # same multi-host bring-up and --recipe handling as the train CLI
    # (this parser inherits both flag groups; silently ignoring them
    # would run a different loss/monitor than the named recipe, or N
    # duplicated single-process runs instead of a sharded one)
    init_distributed(args)

    import jax

    from imageretrievalresearch_tpu.models import create_model
    from imageretrievalresearch_tpu.train import Trainer, make_optimizer
    from imageretrievalresearch_tpu.train.lr_finder import lr_find
    from imageretrievalresearch_tpu.utils.analysis import find_lr_cos_sim_score

    cfg = build_config(args, vars(build_parser().parse_args([])))

    # the shared train-CLI builders handle every --dataset family, so the
    # sweep runs the same loader/task (triplet or CE-classifier) the real
    # training run would
    ds = build_dataset(cfg, args, "train")
    loader = build_loader(cfg, args, ds, "train")
    val_ds = build_dataset(cfg, args, "val")
    val_loader = build_loader(cfg, args, val_ds, "val") if val_ds else None
    backbone = create_model(cfg.model_name,
                            num_classes=ds.get_cat_length(),
                            dtype=cfg.compute_dtype)
    # reference eps/alpha for the booster (train/find_lr.py:87)
    booster = functools.partial(find_lr_cos_sim_score, eps=5, alpha=1,
                                mode="for_pos")
    trainer = Trainer(cfg, backbone, loader, val_loader,
                      metric_transforms={"cos_sims": booster})

    def make_state(schedule):
        tx = make_optimizer(cfg.optimizer_name, schedule, cfg.weight_decay)
        return trainer.init_state(tx=tx)

    def sweep_step(state, batch, key):
        tkey, skey = jax.random.split(key)
        return trainer._train_step(state, trainer._prepare(batch), tkey,
                                   skey)

    def batches():
        # yield RAW host batches: lr_find retains every batch in its
        # wrap-around replay list, and device-prepared batches would pin
        # up to num_lr_steps full triplet batches in HBM for the whole
        # sweep (~2.9 GB at bs64x224; OOM at bs256). _prepare runs per
        # step inside sweep_step, exactly like Trainer.train_epoch.
        yield from loader

    out = lr_find(make_state, sweep_step, batches(), jax.random.key(0),
                  min_lr=args.min_lr, max_lr=args.max_lr,
                  num_steps=args.num_lr_steps)
    print(f"Suggested lr: {out['suggestion']}")
    if args.train_after and out["suggestion"]:
        cfg.learning_rate = out["suggestion"]
        save_name = (f"{cfg.model_name}_{cfg.optimizer_name}_"
                     f"{cfg.learning_rate:.6g}")
        cfg.checkpoint_dir = os.path.join(cfg.save_path, save_name)
        from imageretrievalresearch_tpu.utils.logging import MetricLogger
        logger = MetricLogger(
            cfg.checkpoint_dir if jax.process_index() == 0 else None,
            use_wandb=cfg.wandb, run_name=save_name,
            log_every_n_steps=cfg.log_every_n_steps)
        trainer2 = Trainer(cfg, backbone, loader, val_loader, logger=logger,
                           metric_transforms={"cos_sims": booster})
        state, _ = trainer2.fit()
        test_ds = build_dataset(cfg, args, "test")
        if test_ds is not None:
            # reference: trainer.test on the test split, results pickled
            # under results/ with the run name (train/find_lr.py:440-457);
            # only the sketchy-family datasets carry a test split
            test_loader = build_loader(cfg, args, test_ds, "test")
            results_path = os.path.join(
                cfg.save_path, "results", f"{save_name}_results.pickle")
            results = trainer2.test(state, test_loader,
                                    results_path=results_path,
                                    score_booster=booster)
            print(f"Results of the training are saved in {results_path}")
            out["test_results"] = results
    return out


def main() -> None:
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
