"""Analysis-utility tests: ROC parity with the reference loop, score boosters,
lr finder mechanics, metric logger."""

import json

import numpy as np
import pandas as pd
import pytest

from imageretrievalresearch_tpu.utils.analysis import (
    cos_sim_score_booster,
    cos_sim_score_with_threshold,
    find_lr_cos_sim_score,
    roc_curve,
)
from imageretrievalresearch_tpu.utils.logging import MetricLogger


class TestROC:
    def _reference_roc(self, df):
        # literal transcription of utils/roc_curve_from_scratch.py:20-77
        thresholds = list(np.array(list(range(0, 105, 5))) / 100)
        roc_point = []
        for threshold in thresholds:
            tp = fp = fn = tn = 0
            for _, instance in df.iterrows():
                actual = instance["actual"]
                prediction = instance["prediction"]
                pred_cls = 1 if prediction >= threshold else 0
                if pred_cls == 1 and actual == 1:
                    tp += 1
                elif actual == 1 and pred_cls == 0:
                    fn += 1
                elif actual == 0 and pred_cls == 1:
                    fp += 1
                else:
                    tn += 1
            roc_point.append([tp / (tp + fn), fp / (tn + fp)])
        pts = np.asarray(roc_point)
        auc = round(abs(np.trapezoid(pts[:, 0], pts[:, 1])), 4)
        return pts[:, 0], pts[:, 1], auc

    def test_matches_reference_loop(self, rng, tmp_path):
        df = pd.DataFrame({
            "actual": rng.integers(0, 2, 200),
            "prediction": rng.random(200),
        })
        tpr_ref, fpr_ref, auc_ref = self._reference_roc(df)
        path = str(tmp_path / "preds.csv")
        df.to_csv(path, index=False)
        tpr, fpr, thresholds, auc = roc_curve(path)
        np.testing.assert_allclose(tpr, tpr_ref)
        np.testing.assert_allclose(fpr, fpr_ref)
        assert auc == auc_ref
        assert len(thresholds) == 21


class TestScoreBoosters:
    def test_threshold_booster_formulas(self):
        # reference utils/score_booster.py:16-19
        assert cos_sim_score_with_threshold(0.8, 0.1, 0.2, 0.5) == \
            pytest.approx((0.8 + 0.1) / (0.1 + 0.2))
        assert cos_sim_score_with_threshold(0.3, 0.1, 0.2, 0.5) == \
            pytest.approx(abs((0.3 + 0.2 / 0.1) / (2 * 0.1)))

    def test_mode_booster_formulas(self):
        assert cos_sim_score_booster(0.8, 0.1, 0.2, "for_pos") == \
            pytest.approx((0.8 + 0.1) / (0.1 + 0.2))
        assert cos_sim_score_booster(0.8, 0.1, 0.2, "for_neg") == \
            pytest.approx(abs((0.8 + 0.2 / 0.1) / 0.2))
        with pytest.raises(ValueError):
            cos_sim_score_booster(0.5, 1, 1, "nope")

    def test_find_lr_variant_low_branch(self):
        # train/find_lr.py:90-95: score < 0.3 uses eps*alpha in denominator
        lo = find_lr_cos_sim_score(0.2, 5, 1, "for_pos")
        hi = find_lr_cos_sim_score(0.8, 5, 1, "for_pos")
        assert lo == pytest.approx((0.2 + 5) / (5 + 5))
        assert hi == pytest.approx((0.8 + 5) / 6)


class TestMetricLogger:
    def test_jsonl_and_interval(self, tmp_path, capsys):
        lg = MetricLogger(str(tmp_path), log_every_n_steps=5)
        lg.log({"train_loss": 1.0}, step=3)          # skipped
        lg.log({"train_loss": 0.5}, step=5)          # logged
        lg.log({"cos_sims": 0.9}, step=7, force=True)
        lg.close()
        lines = [json.loads(l) for l in
                 open(tmp_path / "metrics.jsonl").read().splitlines()]
        assert len(lines) == 2
        assert lines[0]["train_loss"] == 0.5
        assert lines[1]["cos_sims"] == 0.9


class TestLRFinder:
    def test_quadratic_toy_problem(self):
        import jax
        import jax.numpy as jnp
        import optax
        from imageretrievalresearch_tpu.train.lr_finder import lr_find

        def make_state(schedule):
            tx = optax.sgd(schedule)
            params = {"w": jnp.asarray(5.0)}
            return {"params": params, "opt": tx.init(params), "tx": tx,
                    "step": 0}

        def train_step(state, batch, rng):
            def loss_fn(p):
                return (p["w"] - 1.0) ** 2
            loss = loss_fn(state["params"])
            grads = jax.grad(loss_fn)(state["params"])
            upd, opt = state["tx"].update(grads, state["opt"],
                                          state["params"])
            params = optax.apply_updates(state["params"], upd)
            new = dict(state, params=params, opt=opt, step=state["step"] + 1)
            return new, {"train_loss": loss}

        out = lr_find(make_state, train_step, [None] * 100,
                      jax.random.key(0), num_steps=60, max_lr=10.0)
        assert out["suggestion"] is not None
        assert 1e-6 < out["suggestion"] < 10.0
        assert len(out["losses"]) > 10


class TestCheckpointManager:
    """Lightning-parity retention semantics (utils/checkpoint.py):
    earliest save wins exact metric ties (strict-improvement replacement),
    while the most recent save stays restorable for resume even after
    best-k retention discards it."""

    def _save(self, mgr, step, value, metric=1.0):
        mgr.save(step, {"w": np.full((2,), float(value), np.float32)},
                 {"cos_sims": metric})

    def test_tied_monitor_keeps_earliest_and_latest_survives(self, tmp_path):
        from imageretrievalresearch_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        mgr = CheckpointManager(str(tmp_path / "ck"), monitor="cos_sims",
                                mode="max", save_top_k=1)
        for step in (5, 10, 15):      # constant monitor: all exact ties
            self._save(mgr, step, value=step)
        mgr.wait()
        # Lightning replaces only on strict improvement -> first tie wins
        assert mgr.best_step() == 5
        # ...but resume must continue from the newest save, not the best
        assert mgr.latest_step() == 15
        like = {"w": np.zeros((2,), np.float32)}
        assert float(mgr.restore(like, step=15)["w"][0]) == 15.0
        assert float(mgr.restore(like)["w"][0]) == 5.0
        mgr.close()

    def test_strict_improvement_still_replaces(self, tmp_path):
        from imageretrievalresearch_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        mgr = CheckpointManager(str(tmp_path / "ck"), monitor="cos_sims",
                                mode="max", save_top_k=1)
        self._save(mgr, 1, value=1, metric=0.5)
        self._save(mgr, 2, value=2, metric=0.9)   # genuine improvement
        self._save(mgr, 3, value=3, metric=0.9)   # tie with step 2
        mgr.wait()
        assert mgr.best_step() == 2
        mgr.close()

    def test_resume_tie_still_keeps_pre_preemption_best(self, tmp_path):
        """The tie-break ordinal must reseed above the RETAINED max, not the
        retained count: evicted worse-metric saves consume ordinals, so a
        count-based reseed hands a post-resume save a smaller ordinal than
        the retained best — and an exact metric tie would then evict it
        (Lightning keeps the earliest on ties)."""
        from imageretrievalresearch_tpu.utils.checkpoint import (
            CheckpointManager,
        )

        path = str(tmp_path / "ck")
        mgr = CheckpointManager(path, monitor="cos_sims", mode="max",
                                save_top_k=1)
        self._save(mgr, 10, value=10, metric=0.7)   # _ord 1, later evicted
        self._save(mgr, 20, value=20, metric=0.5)   # _ord 2, never retained
        self._save(mgr, 30, value=30, metric=0.9)   # _ord 3, the best
        mgr.wait()
        assert mgr.best_step() == 30
        mgr.close()
        mgr2 = CheckpointManager(path, monitor="cos_sims", mode="max",
                                 save_top_k=1)      # resume
        self._save(mgr2, 60, value=60, metric=0.9)  # exact tie with step 30
        mgr2.wait()
        assert mgr2.best_step() == 30   # pre-preemption best survives
        like = {"w": np.zeros((2,), np.float32)}
        assert float(mgr2.restore(like)["w"][0]) == 30.0
        mgr2.close()
