"""CLI end-to-end tests: data_split -> train (1 epoch) -> inference on a
synthetic Sketchy tree, exercising the user-facing argparse surfaces."""

import json
import os

import pytest

from imageretrievalresearch_tpu.data.synthetic import make_sketchy_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_sketchy_tree(str(tmp_path_factory.mktemp("sk")), n_cats=3,
                             n_prods=1, n_photos=8, n_sketches=4, size=32)


class TestDataSplitCLI:
    def test_split(self, tree, tmp_path, monkeypatch):
        import sys

        from imageretrievalresearch_tpu.cli import data_split as cli
        out = str(tmp_path / "split.json")
        monkeypatch.setattr(sys, "argv", [
            "data_split", "--data_dir", tree, "--out_path", out,
            "--layout", "sketchy", "--policy", "cat", "--no-hard_split"])
        cli.main()
        d = json.load(open(out))
        assert set(d) == {"train", "val", "test"}


class TestTrainCLI:
    def test_one_epoch(self, tree, tmp_path):
        from imageretrievalresearch_tpu.cli.train import build_parser, run
        save = str(tmp_path / "models")
        args = build_parser().parse_args([
            "--ims_path", tree, "--model_name", "efficientnet_b0",
            "--batch_size", "8", "--image_size", "32",
            "--max_epochs", "1", "--compute_dtype", "float32",
            "--num_workers", "2", "-sp", save,
        ])
        run(args)
        ckpt_dir = os.path.join(save, "efficientnet_b0_Adam_0.0047863")
        assert os.path.exists(os.path.join(ckpt_dir, "hparams.yaml"))
        # metrics jsonl written by the logger
        assert os.path.exists(os.path.join(ckpt_dir, "metrics.jsonl"))


class TestInferenceCLI:
    def test_random_init_inference(self, tree, tmp_path):
        from imageretrievalresearch_tpu.cli.inference import (
            build_parser,
            run,
        )
        args = build_parser().parse_args([
            "-ip", tree, "-mn", "efficientnet_b0", "-is", "32",
            "-bs", "8", "--topk_variant", "class_dedup",
            "--viz_dir", str(tmp_path / "viz"),
        ])
        run(args)
        import glob
        assert glob.glob(str(tmp_path / "viz" / "*.png"))
