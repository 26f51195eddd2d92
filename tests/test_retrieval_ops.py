"""Retrieval kernel tests: blocked top-k and Pallas scores vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageretrievalresearch_tpu.ops.retrieval import (
    chunked_topk,
    cosine_scores,
    cosine_topk,
    l2_normalize,
    pallas_cosine_scores,
)


def _qg(rng, q=37, g=500, d=64):
    return (rng.normal(size=(q, d)).astype(np.float32),
            rng.normal(size=(g, d)).astype(np.float32))


class TestChunkedTopk:
    def test_matches_dense_topk(self, rng):
        sims = rng.normal(size=(16, 5000)).astype(np.float32)
        v, i = chunked_topk(jnp.asarray(sims), 150, chunk=512)
        vr, ir = jax.lax.top_k(jnp.asarray(sims), 150)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))

    def test_small_gallery_passthrough(self, rng):
        sims = rng.normal(size=(4, 100)).astype(np.float32)
        v, i = chunked_topk(jnp.asarray(sims), 10, chunk=2048)
        vr, ir = jax.lax.top_k(jnp.asarray(sims), 10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))

    def test_k_larger_than_gallery(self, rng):
        sims = rng.normal(size=(4, 7)).astype(np.float32)
        v, i = chunked_topk(jnp.asarray(sims), 150)
        assert v.shape == (4, 7)

    def test_ragged_final_chunk(self, rng):
        sims = rng.normal(size=(8, 1000)).astype(np.float32)
        v, i = chunked_topk(jnp.asarray(sims), 20, chunk=300)
        vr, ir = jax.lax.top_k(jnp.asarray(sims), 20)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))


class TestCosineTopk:
    def test_matches_torch_semantics(self, rng):
        import torch
        q, g = _qg(rng)
        v, i = cosine_topk(q, g, 5)
        cos = torch.nn.CosineSimilarity(dim=1, eps=1e-6)
        for qi in range(0, 37, 7):
            sim = cos(torch.from_numpy(q[qi]).unsqueeze(0),
                      torch.from_numpy(g))
            tv, ti = torch.topk(sim, k=5)
            np.testing.assert_array_equal(np.asarray(i)[qi], ti.numpy())
            np.testing.assert_allclose(np.asarray(v)[qi], tv.numpy(),
                                       rtol=1e-5, atol=1e-6)

    def test_query_blocking_invariant(self, rng):
        q, g = _qg(rng, q=100)
        v1, i1 = cosine_topk(q, g, 7, query_block=16)
        v2, i2 = cosine_topk(q, g, 7, query_block=512)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_self_retrieval(self, rng):
        q, _ = _qg(rng, q=20)
        v, i = cosine_topk(q, q, 1)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(20))
        np.testing.assert_allclose(np.asarray(v)[:, 0], 1.0, rtol=1e-5)


class TestMethodOptions:
    def test_approx_high_recall_on_cpu(self, rng):
        q, g = _qg(rng, q=30)
        v1, i1 = cosine_topk(q, g, 10)
        v2, i2 = cosine_topk(q, g, 10, method="approx")
        rec = np.mean([len(set(np.asarray(i1)[i].tolist())
                           & set(np.asarray(i2)[i].tolist())) / 10
                       for i in range(30)])
        assert rec > 0.9

    def test_bf16_matmul_ranking_stable(self, rng):
        q, g = _qg(rng, q=30)
        _, i1 = cosine_topk(q, g, 5)
        _, i2 = cosine_topk(q, g, 5, matmul_dtype="bfloat16")
        overlap = np.mean([len(set(np.asarray(i1)[i].tolist())
                               & set(np.asarray(i2)[i].tolist())) / 5
                           for i in range(30)])
        assert overlap > 0.9


class TestPallasScores:
    def test_interpret_matches_xla(self, rng):
        q, g = _qg(rng, q=20, g=300, d=128)
        ours = np.asarray(pallas_cosine_scores(
            np.asarray(l2_normalize(q)), g, interpret=True))
        ref = np.asarray(cosine_scores(q, g))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_topk_pipeline(self, rng):
        q, g = _qg(rng, q=16, g=256, d=64)
        v1, i1 = cosine_topk(q, g, 5, use_pallas=True, interpret=True)
        v2, i2 = cosine_topk(q, g, 5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-5)
