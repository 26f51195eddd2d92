"""Smoke tests for examples/*.py — the notebook replacements.

These scripts import the package and drive real flows but nothing else
executed them in CI; they can rot silently exactly the way the round-2
find_lr CLI did (stale call into a refactored Trainer). Each test runs an
example as a subprocess on tiny synthetic inputs and asserts exit 0 plus
the artifacts/output it promises.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(script, *args, timeout=540):
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    # These are CPU smoke tests: the child must never start the sandbox's
    # remote-TPU ("axon") client. Its sitecustomize registers the backend
    # at interpreter start whenever PALLAS_AXON_POOL_IPS is set, and that
    # registration can spin forever in the chip-grant claim loop when
    # another live process (e.g. the pytest parent) holds the grant —
    # observed as a child stuck at startup with ~0 CPU until the timeout.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("_AXON_REGISTERED", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-u", os.path.join(EXAMPLES, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert res.returncode == 0, (
        f"{script} exited {res.returncode}\nstdout:\n{res.stdout[-3000:]}\n"
        f"stderr:\n{res.stderr[-3000:]}")
    return res


class TestScoreBoosterDemo:
    def test_sweep_and_roc_from_csv(self, tmp_path):
        csv = tmp_path / "preds.csv"
        rng = np.random.default_rng(0)
        actual = rng.integers(0, 2, 64)
        pred = np.clip(actual * 0.6 + rng.random(64) * 0.4, 0, 1)
        with open(csv, "w") as f:
            f.write("actual,prediction\n")
            for a, p in zip(actual, pred):
                f.write(f"{a},{p:.4f}\n")
        res = _run("score_booster_demo.py", "--csv", str(csv))
        assert "AUC" in res.stdout or "auc" in res.stdout

    def test_synthetic_default(self):
        res = _run("score_booster_demo.py")
        assert "find_lr" in res.stdout


@pytest.mark.slow
class TestServingPipeline:
    def test_full_lifecycle(self, tmp_path):
        res = _run("serving_pipeline.py", "--workdir",
                   str(tmp_path / "demo"), "--platform", "cpu")
        # promises: compact artifact on disk + a live HTTP answer (serve
        # chatter goes to stderr; stdout carries the JSON rankings)
        assert os.path.exists(str(tmp_path / "demo"))
        assert '"indices"' in res.stdout
        assert "/search" in res.stdout + res.stderr


@pytest.mark.slow
class TestTrainingAnalysis:
    def test_eval_flow_on_synthetic_tree(self, tmp_path):
        from imageretrievalresearch_tpu.data.synthetic import (
            make_sketchy_tree,
        )
        tree = make_sketchy_tree(str(tmp_path / "sk"), n_cats=3, n_prods=1,
                                 n_photos=6, n_sketches=3, size=32)
        gal = str(tmp_path / "gal.npz")
        res = _run("training_analysis.py", "--ims_path", tree,
                   "--model_name", "efficientnet_b0", "--input_size", "32",
                   "--batch_size", "8", "--topk", "9",
                   "--save_gallery", gal)
        assert os.path.exists(gal)
        assert "top1" in res.stdout
