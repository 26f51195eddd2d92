"""Golden-value parity tests: our JAX losses vs torch reference math.

torch (CPU) is available in the image, so we check bit-level agreement with
the exact modules the reference instantiates (train/train.py:139-140,
utils/contrastive_loss.py:56-61).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imageretrievalresearch_tpu import losses


def _pair(rng, b=16, d=32):
    x1 = rng.normal(size=(b, d)).astype(np.float32)
    x2 = rng.normal(size=(b, d)).astype(np.float32)
    return x1, x2


class TestCosineSimilarity:
    def test_matches_torch(self, rng):
        x1, x2 = _pair(rng)
        ours = np.asarray(losses.cosine_similarity(x1, x2))
        theirs = torch.nn.CosineSimilarity(dim=1, eps=1e-6)(
            torch.from_numpy(x1), torch.from_numpy(x2)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    def test_eps_clamp_on_zero_vector(self):
        x1 = np.zeros((2, 4), dtype=np.float32)
        x2 = np.ones((2, 4), dtype=np.float32)
        ours = np.asarray(losses.cosine_similarity(x1, x2))
        theirs = torch.nn.CosineSimilarity(dim=1, eps=1e-6)(
            torch.from_numpy(x1), torch.from_numpy(x2)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


class TestCosineEmbeddingLoss:
    @pytest.mark.parametrize("margin", [0.5, 0.3, 0.2, 0.0])
    @pytest.mark.parametrize("target", [1.0, -1.0])
    def test_matches_torch(self, rng, margin, target):
        x1, x2 = _pair(rng)
        ours = float(losses.cosine_embedding_loss(x1, x2, target, margin=margin))
        t = torch.full((x1.shape[0],), target)
        theirs = float(torch.nn.CosineEmbeddingLoss(margin=margin)(
            torch.from_numpy(x1), torch.from_numpy(x2), t))
        assert ours == pytest.approx(theirs, rel=1e-6, abs=1e-7)

    @pytest.mark.parametrize("scale", [1e-4, 1e-5, 1e-6])
    def test_small_norm_eps_matches_torch(self, scale):
        """torch adds 1e-12 to each SQUARED norm (not a norm clamp): at
        norm 1e-5 the loss of identical vectors is 0.0099, not 0 — the
        regime of a near-dead head early in training."""
        x = np.array([[scale, 0.0]], dtype=np.float32)
        ours = float(losses.cosine_embedding_loss(x, x, 1.0))
        theirs = float(torch.nn.functional.cosine_embedding_loss(
            torch.from_numpy(x), torch.from_numpy(x), torch.tensor([1.0])))
        assert ours == pytest.approx(theirs, rel=1e-4, abs=1e-7)

    def test_broadcast_scalar_target_like_reference(self, rng):
        # reference passes labels["pos"] = tensor(1.).unsqueeze(0)
        # (train/train.py:81) broadcast against the batch.
        x1, x2 = _pair(rng, b=8)
        ours = float(losses.cosine_embedding_loss(x1, x2, np.array([1.0]),
                                                  margin=0.5))
        theirs = float(torch.nn.CosineEmbeddingLoss(margin=0.5)(
            torch.from_numpy(x1), torch.from_numpy(x2),
            torch.tensor(1.0).unsqueeze(0)))
        assert ours == pytest.approx(theirs, rel=1e-6, abs=1e-7)


class TestContrastiveLoss:
    @pytest.mark.parametrize("margin", [0.5, 0.3])
    @pytest.mark.parametrize("label", [1.0, 0.0])
    @pytest.mark.parametrize("mean", [True, False])
    def test_matches_reference_formula(self, rng, margin, label, mean):
        fm1, fm2 = _pair(rng)
        ours = float(losses.contrastive_loss(fm1, fm2, label,
                                             margin=margin, mean=mean))
        # exact torch transcription of utils/contrastive_loss.py:56-61
        t1, t2 = torch.from_numpy(fm1), torch.from_numpy(fm2)
        dis = (t2 - t1).pow(2).sum(1)
        lv = 0.5 * (label * dis + (1 + -1 * label)
                    * F.relu(margin - (dis + 1e-9).sqrt()).pow(2))
        theirs = float(lv.mean() if mean else lv.sum())
        assert ours == pytest.approx(theirs, rel=1e-5, abs=1e-6)

    def test_identical_inputs_positive_label_is_zero(self, rng):
        fm, _ = _pair(rng)
        assert float(losses.contrastive_loss(fm, fm, 1.0, margin=0.5)) == 0.0

    def test_identical_inputs_negative_label_is_half_margin_sq(self, rng):
        # d=0 => 0.5 * relu(margin - sqrt(eps))^2 ≈ 0.5 * margin^2
        fm, _ = _pair(rng)
        got = float(losses.contrastive_loss(fm, fm, 0.0, margin=0.5))
        assert got == pytest.approx(0.5 * (0.5 - np.sqrt(1e-9)) ** 2, rel=1e-5)


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits = rng.normal(size=(16, 125)).astype(np.float32)
        labels = rng.integers(0, 125, size=(16,))
        ours = float(losses.cross_entropy_loss(logits, labels))
        theirs = float(torch.nn.CrossEntropyLoss()(
            torch.from_numpy(logits), torch.from_numpy(labels)))
        assert ours == pytest.approx(theirs, rel=1e-6)


class TestCombos:
    def test_triplet_losses_sum(self, rng):
        q, p = _pair(rng)
        n = rng.normal(size=q.shape).astype(np.float32)
        d = losses.triplet_losses(q, p, n, cos_margin=0.5)
        assert float(d["loss_cos"]) == pytest.approx(
            float(d["loss_cos_poss"]) + float(d["loss_cos_negs"]), rel=1e-6)

    def test_contrastive_pair_losses_sum(self, rng):
        q, p = _pair(rng)
        n = rng.normal(size=q.shape).astype(np.float32)
        d = losses.contrastive_pair_losses(q, p, n, margin=0.3)
        assert float(d["loss_con"]) == pytest.approx(
            float(d["loss_con_poss"]) + float(d["loss_con_negs"]), rel=1e-6)
