"""train CLI recipe surfaces: T5 imagefolder CE + T4 triple layout.

Split from the original tests/test_cli.py so every CLI test file fits the
~590 s background-shell cap on this 1-core host (VERDICT r3 weak #6).
"""

import json
import os

import numpy as np
import pytest

from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_sketchy_tree(str(tmp_path_factory.mktemp("sk")), n_cats=3,
                             n_prods=1, n_photos=8, n_sketches=4, size=32)


class TestTrainCLIImageFolder:
    def test_t5_recipe_on_folder_tree(self, tmp_path):
        """The T5 recipe end-to-end: plain CE classification on a
        class-per-subfolder tree with a seeded 80/20 holdout (reference
        train/train_vit_crossentropy.py:50,59), val_top1 monitored from
        logits. The val split (5 images, batch 8) exercises the exact
        unsharded partial-batch eval path."""
        from imageretrievalresearch_tpu.cli.train import build_parser, run
        from imageretrievalresearch_tpu.data.synthetic import (
            make_classfolder_tree,
        )

        photo_root, _ = make_classfolder_tree(
            str(tmp_path / "imf"), n_classes=3, n_photos=7, n_sketches=1,
            size=32)
        save = str(tmp_path / "models")
        args = build_parser().parse_args([
            "--recipe", "train_vit_crossentropy",
            "--ims_path", photo_root, "--model_name", "efficientnet_b0",
            "--batch_size", "8", "--image_size", "32",
            "--max_epochs", "1", "--compute_dtype", "float32",
            "--num_workers", "2", "-sp", save,
        ])
        run(args)
        ckpt_dir = os.path.join(save, "efficientnet_b0_Adam_0.001")
        assert os.path.exists(os.path.join(ckpt_dir, "hparams.yaml"))
        logged = [json.loads(l) for l in
                  open(os.path.join(ckpt_dir, "metrics.jsonl"))]
        keys = set().union(*(set(r) for r in logged))
        assert {"val_loss", "val_top1", "val_top3"} <= keys
        top1 = [r["val_top1"] for r in logged if "val_top1" in r]
        assert top1 and all(0.0 <= v <= 1.0 for v in top1)


class TestTrainCLITriple:
    def test_t4_layout_trains_end_to_end(self, tmp_path):
        """--dataset triple: the T4 photo/+sketch/ class-folder layout
        (reference train/train_vit_triplet.py:17,52) trains through the
        CLI with a seeded holdout; cos-only loss per the T4 recipe."""
        from imageretrievalresearch_tpu.cli.train import build_parser, run
        from imageretrievalresearch_tpu.data.synthetic import (
            make_classfolder_tree,
        )

        root = str(tmp_path / "t4")
        make_classfolder_tree(root, n_classes=3, n_photos=8, n_sketches=4,
                              size=32)
        save = str(tmp_path / "models")
        args = build_parser().parse_args([
            "--dataset", "triple", "--ims_path", root,
            "--model_name", "efficientnet_b0",
            "-ofm", "True", "-otl", "None", "--cos_margin", "0.2",
            "--batch_size", "8", "--image_size", "32",
            "--max_epochs", "1", "--compute_dtype", "float32",
            "--num_workers", "2", "-sp", save, "--learning_rate", "1e-3",
        ])
        run(args)
        ckpt_dir = os.path.join(save, "efficientnet_b0_Adam_0.001")
        logged = [json.loads(l) for l in
                  open(os.path.join(ckpt_dir, "metrics.jsonl"))]
        keys = set().union(*(set(r) for r in logged))
        assert {"val_loss", "cos_sims", "val_top1"} <= keys
