"""Metric tests: vectorized top-k vs eager torch-style reference loops.

Pins each of the reference's three top-k definitions (SURVEY.md §3.3 note)
against a literal numpy/torch transcription of the reference loops.
"""

import numpy as np
import pytest
import torch

from imageretrievalresearch_tpu import metrics


def _embeds(rng, n=32, d=16):
    return rng.normal(size=(n, d)).astype(np.float32)


def _torch_cos(a, b):
    return torch.nn.CosineSimilarity(dim=1, eps=1e-6)(a, b)


class TestInBatchTopk:
    def test_matches_reference_loop(self, rng):
        # literal transcription of train/train.py:249-255
        fm_ims = _embeds(rng)
        fm_poss = _embeds(rng)
        clss = rng.integers(0, 5, size=(32,))
        t_ims, t_poss = torch.from_numpy(fm_ims), torch.from_numpy(fm_poss)
        t_cls = torch.from_numpy(clss)
        top3 = top1 = 0
        for idx in range(len(fm_ims)):
            sim = _torch_cos(t_ims[idx].unsqueeze(0), t_poss)
            vals, inds = torch.topk(sim, k=3)
            if (t_cls[idx] == t_cls[inds[0]] or t_cls[idx] == t_cls[inds[1]]
                    or t_cls[idx] == t_cls[inds[2]]):
                top3 += 1
            if t_cls[idx] == t_cls[inds[0]]:
                top1 += 1
        ours = metrics.inbatch_topk(fm_ims, fm_poss, clss, k=3)
        assert float(ours["top3"]) == pytest.approx(top3 / 32)
        assert float(ours["top1"]) == pytest.approx(top1 / 32)

    def test_perfect_retrieval(self, rng):
        fm = _embeds(rng)
        clss = np.arange(32)  # all classes distinct, pos == qry embedding
        ours = metrics.inbatch_topk(fm, fm, clss, k=3)
        assert float(ours["top1"]) == 1.0
        assert float(ours["top3"]) == 1.0

    def test_batch_smaller_than_k(self, rng):
        """A drop_last=False final eval batch can have fewer than k
        samples; lax.top_k must be clamped (the metric KEY keeps k so the
        logged series name stays stable)."""
        fm = rng.normal(size=(2, 8)).astype(np.float32)
        out = metrics.inbatch_topk(fm, fm, np.arange(2), k=3)
        assert set(out) == {"top1", "top3"}
        assert float(out["top3"]) == 1.0
        out2 = metrics.gallery_topk_index_match(
            metrics.cosine_sim_matrix(fm, fm))
        assert set(out2) == {"top1", "top3"}
        assert float(out2["top1"]) == 1.0


class TestPairwiseStats:
    def test_matches_torch(self, rng):
        q, p, n = _embeds(rng), _embeds(rng), _embeds(rng)
        ours = metrics.pairwise_cos_stats(q, p, n)
        sims = _torch_cos(torch.from_numpy(q), torch.from_numpy(p))
        unsims = _torch_cos(torch.from_numpy(q), torch.from_numpy(n))
        assert float(ours["cos_sims"]) == pytest.approx(float(sims.mean()), rel=1e-5)
        assert float(ours["cos_unsims"]) == pytest.approx(float(unsims.mean()), rel=1e-5)


class TestGalleryIndexMatch:
    def test_identity_gallery(self, rng):
        fm = _embeds(rng, n=20)
        sims = np.asarray(metrics.cosine_sim_matrix(fm, fm))
        out = metrics.gallery_topk_index_match(sims)
        assert float(out["top1"]) == 1.0
        assert float(out["top3"]) == 1.0

    def test_shifted_positive(self, rng):
        # query i's nearest neighbor is gallery i+1 -> top1=0 but i itself
        # still within top3 if second-nearest.
        q = _embeds(rng, n=10)
        gallery = q.copy()
        noisy = q + 0.01 * rng.normal(size=q.shape).astype(np.float32)
        # gallery[i] = strong match for query i-1, weak for i
        g = np.roll(gallery, -1, axis=0) * 2.0 + noisy
        sims = np.asarray(metrics.cosine_sim_matrix(q, g))
        out = metrics.gallery_topk_index_match(sims)
        assert 0.0 <= float(out["top1"]) <= float(out["top3"]) <= 1.0


class TestUniqueClassDedup:
    def _reference_dedup(self, inds, vals, classes, num_unique=3):
        # literal transcription of training_analysis.ipynb cell 2 dedup loop
        top_i, top_v, top_r = [], [], []
        for i, v in zip(inds, vals):
            r = int(classes[int(i)])
            if r not in top_r:
                top_r.append(r)
                top_v.append(v)
                top_i.append(int(i))
            if len(top_r) == num_unique:
                break
        return top_i, top_v, top_r

    def test_matches_reference_loop(self, rng):
        for trial in range(10):
            g = 40
            classes = rng.integers(0, 8, size=(g,))
            order = rng.permutation(g)[:20]
            vals = -np.sort(-rng.random(20).astype(np.float32))
            ui, uv, uc = metrics.unique_class_dedup(
                np.asarray(order), vals, classes, num_unique=3)
            ri, rv, rc = self._reference_dedup(order, vals, classes)
            np.testing.assert_array_equal(np.asarray(ui)[:len(ri)], ri)
            np.testing.assert_array_equal(np.asarray(uc)[:len(rc)], rc)
            np.testing.assert_allclose(np.asarray(uv)[:len(rv)], rv, rtol=1e-6)

    def test_full_gallery_metric_matches_reference(self, rng):
        q = _embeds(rng, n=24, d=8)
        g = _embeds(rng, n=24, d=8)
        qcls = rng.integers(0, 6, size=(24,))
        gcls = rng.integers(0, 6, size=(24,))
        sims = np.asarray(metrics.cosine_sim_matrix(q, g))
        out = metrics.gallery_topk_class_dedup(sims, qcls, gcls, k=20)
        # reference loop
        top3 = top1 = 0
        for i in range(24):
            order = np.argsort(-sims[i])[:20]
            _, _, top_r = self._reference_dedup(order, sims[i][order], gcls)
            top3 += 1 if int(qcls[i]) in top_r else 0
            top1 += 1 if int(qcls[i]) == top_r[0] else 0
        assert float(out["top3"]) == pytest.approx(top3 / 24)
        assert float(out["top1"]) == pytest.approx(top1 / 24)


class TestClassifierTopk:
    def test_correct_label_in_topk(self, rng):
        logits = rng.normal(size=(16, 10)).astype(np.float32)
        labels = np.argmax(logits, axis=1)
        out = metrics.classifier_topk(logits, labels, k=3)
        assert float(out["top1"]) == 1.0
        assert float(out["top3"]) == 1.0
