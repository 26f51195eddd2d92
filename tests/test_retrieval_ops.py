"""Retrieval kernel tests: blocked top-k and Pallas scores vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imageretrievalresearch_tpu.ops.retrieval import (
    FUSED_G_TILE,
    FUSED_T_DEPTH,
    chunked_topk,
    cosine_scores,
    cosine_topk,
    fused_cosine_topk_pallas,
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


class TestFusedTopk:
    """The streaming exact top-k kernel (interpret mode on CPU).

    Exact-match tests use integer-valued embeddings: scores are then
    bitwise-reproducible across matmul lowerings, so index equality with
    lax.top_k is well-defined (with float data, different accumulation
    orders perturb near-ties by ~1 ULP — covered by the statistical test).
    """

    def _int_qg(self, rng, q=24, g=2100, d=32):
        """Rows of 16 entries of ±1 (norm exactly 4): normalized entries,
        products, and partial sums are all exactly representable in f32, so
        scores are bitwise-identical under ANY accumulation order — and
        quantized to multiples of 1/16, mass-producing genuine ties."""
        def rows(n):
            out = np.zeros((n, d), np.float32)
            for r in range(n):
                pos = rng.choice(d, 16, replace=False)
                out[r, pos] = rng.choice([-1.0, 1.0], 16)
            return out
        return rows(q), rows(g)

    def test_exact_match_ties_and_certificate_soundness(self, rng):
        q, g = self._int_qg(rng)
        g[500] = g[3]        # exact duplicates -> more ties
        g[1700] = g[3]
        qh = l2_normalize(jnp.asarray(q))
        v, i, ok = fused_cosine_topk_pallas(qh, jnp.asarray(g), 150,
                                            interpret=True)
        rv, ri = jax.lax.top_k(qh @ l2_normalize(jnp.asarray(g)).T, 150)
        ok, i, ri = np.asarray(ok), np.asarray(i), np.asarray(ri)
        v, rv = np.asarray(v), np.asarray(rv)
        assert ok.any()
        # soundness: every certificate-true row equals lax.top_k exactly,
        # including the torch tie order (lowest index first)
        for r in np.nonzero(ok)[0]:
            np.testing.assert_array_equal(i[r], ri[r])
            np.testing.assert_array_equal(v[r], rv[r])
        # the public wrapper is exact regardless of certificates
        wv, wi = cosine_topk(jnp.asarray(q), jnp.asarray(g), 150,
                             method="fused", interpret=True)
        np.testing.assert_array_equal(np.asarray(wi), ri)
        np.testing.assert_array_equal(np.asarray(wv), rv)

    def test_certificate_fails_on_bin_overflow_and_wrapper_falls_back(
            self, rng):
        # t_depth+2 distinct strong rows at stride g_tile share bin 0; the
        # bin overflows its t_depth-deep buffer -> certificate must go
        # false, and the cosine_topk wrapper must still return the exact
        # result via its repair/fallback (geometry derived from the kernel
        # defaults so this keeps overflowing if they are retuned)
        n_strong = FUSED_T_DEPTH + 2
        q, g = self._int_qg(rng, q=8, g=max(4096, FUSED_G_TILE * n_strong))
        for t in range(n_strong):
            row = np.zeros((32,), np.float32)
            row[:16] = 1.0
            row[16 + t % 16] = 0.0   # keep distinct-but-similar direction
            row[t] = 2.0 + t    # dominant alignment, distinct norms
            g[t * FUSED_G_TILE] = row
        q[:] = 0.0
        q[:, :16] = 1.0          # all queries align with the strong rows
        qh = l2_normalize(jnp.asarray(q))
        v, i, ok = fused_cosine_topk_pallas(qh, jnp.asarray(g), 150,
                                            interpret=True)
        assert not np.asarray(ok).all()
        rv, ri = jax.lax.top_k(qh @ l2_normalize(jnp.asarray(g)).T, 150)
        wv, wi = cosine_topk(jnp.asarray(q), jnp.asarray(g), 150,
                             method="fused", interpret=True)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))

    def test_float_data_near_tie_divergence_only(self, rng):
        q, g = _qg(rng, q=16, g=2100, d=64)
        qh = l2_normalize(jnp.asarray(q))
        v, i, ok = fused_cosine_topk_pallas(qh, jnp.asarray(g), 150,
                                            interpret=True)
        rv, ri = jax.lax.top_k(qh @ l2_normalize(jnp.asarray(g)).T, 150)
        v, i = np.asarray(v), np.asarray(i)
        rv, ri = np.asarray(rv), np.asarray(ri)
        mism = i != ri
        assert mism.mean() < 0.005, mism.mean()
        # every divergence is a ULP-level near-tie, not a ranking error
        if mism.any():
            np.testing.assert_allclose(v[mism], rv[mism],
                                       rtol=0, atol=1e-5)

    def test_ragged_shapes_and_small_k(self, rng):
        q, g = self._int_qg(rng, q=7, g=777)
        wv, wi = cosine_topk(jnp.asarray(q), jnp.asarray(g), 5,
                             method="fused", interpret=True)
        rv, ri = jax.lax.top_k(
            l2_normalize(jnp.asarray(q)) @ l2_normalize(jnp.asarray(g)).T, 5)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))

    def test_int8_fused_matches_int8_dense_exactly(self, rng):
        """matmul_dtype='int8' must rank identically to the dense int8
        arithmetic (the fallback contract). Integer data: quantized values,
        int32 products, and the f32 rescale are all exact."""
        from imageretrievalresearch_tpu.ops.retrieval import (
            _int8_scores,
            quantize_rows_int8,
        )
        q, g = self._int_qg(rng, q=24, g=2100)
        qh = l2_normalize(jnp.asarray(q))
        gj = jnp.asarray(g)
        v, i, ok = fused_cosine_topk_pallas(qh, gj, 150,
                                            matmul_dtype="int8",
                                            interpret=True)
        qq, qs = quantize_rows_int8(qh)
        gq, gs = quantize_rows_int8(l2_normalize(gj))
        rv, ri = jax.lax.top_k(_int8_scores(qq, qs, gq, gs), 150)
        ok = np.asarray(ok)
        assert ok.any()
        for r in np.nonzero(ok)[0]:
            np.testing.assert_array_equal(np.asarray(i)[r], np.asarray(ri)[r])
            np.testing.assert_array_equal(np.asarray(v)[r], np.asarray(rv)[r])
        wv, wi = cosine_topk(jnp.asarray(q), gj, 150, method="fused",
                             matmul_dtype="int8", interpret=True)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))

    def test_int8_quantization_roundtrip(self, rng):
        from imageretrievalresearch_tpu.ops.retrieval import (
            quantize_rows_int8,
        )
        x = rng.normal(size=(16, 64)).astype(np.float32)
        qv, s = quantize_rows_int8(jnp.asarray(x))
        assert qv.dtype == jnp.int8 and s.shape == (16, 1)
        np.testing.assert_allclose(np.asarray(qv) * np.asarray(s), x,
                                   atol=np.abs(x).max() / 127 + 1e-7)

    def test_int8_ranking_close_to_f32(self, rng):
        q, g = _qg(rng, q=16, g=2100, d=64)
        vb, ib = cosine_topk(q, g, 10, method="fused",
                             matmul_dtype="int8", interpret=True)
        vf, if_ = cosine_topk(q, g, 10, method="fused", interpret=True)
        assert (np.asarray(ib)[:, 0] == np.asarray(if_)[:, 0]).mean() >= 0.8
        np.testing.assert_allclose(np.asarray(vb), np.asarray(vf),
                                   rtol=0, atol=3e-2)

    def test_partial_certificate_failure_repairs_only_bad_rows(self, rng):
        """Mixed batch: some rows overflow their bin buffers, others pass —
        the bounded retry path must restore exact lax.top_k results for
        every row without a full dense fallback."""
        q, g = self._int_qg(rng, q=16, g=4096)
        for t in range(8):
            row = np.zeros((32,), np.float32)
            row[:16] = 1.0
            row[t] = 2.0 + t
            g[t * 512] = row
        # only the first 3 queries align with the overflowing bin
        q[:3] = 0.0
        q[:3, :16] = 1.0
        qh = l2_normalize(jnp.asarray(q))
        _, _, ok = fused_cosine_topk_pallas(qh, jnp.asarray(g), 20,
                                            interpret=True)
        ok = np.asarray(ok)
        assert not ok[:3].all() and ok[3:].all()
        rv, ri = jax.lax.top_k(qh @ l2_normalize(jnp.asarray(g)).T, 20)
        wv, wi = cosine_topk(jnp.asarray(q), jnp.asarray(g), 20,
                             method="fused", interpret=True)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(rv))

    def test_bf16_fused_matches_bf16_dense_exactly(self, rng):
        """matmul_dtype='bfloat16' must rank identically to the dense bf16
        path (the lax.cond fallback contract): same normalize-then-cast
        arithmetic in both, integer data so accumulation order is exact."""
        q, g = self._int_qg(rng, q=24, g=2100)
        qh = l2_normalize(jnp.asarray(q))
        gj = jnp.asarray(g)
        v, i, ok = fused_cosine_topk_pallas(qh, gj, 150,
                                            matmul_dtype="bfloat16",
                                            interpret=True)
        dense = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), l2_normalize(gj).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        rv, ri = jax.lax.top_k(dense, 150)
        ok = np.asarray(ok)
        assert ok.any()
        for r in np.nonzero(ok)[0]:
            np.testing.assert_array_equal(np.asarray(i)[r], np.asarray(ri)[r])
            np.testing.assert_array_equal(np.asarray(v)[r], np.asarray(rv)[r])
        # the public wrapper with bf16 is exact for the bf16 scores too
        wv, wi = cosine_topk(jnp.asarray(q), gj, 150, method="fused",
                             matmul_dtype="bfloat16", interpret=True)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))

    def test_bf16_fused_close_to_f32_ranking(self, rng):
        """On float data, bf16 scores track f32 within input rounding: the
        retrieved top-1 must agree and values stay within ~1e-2."""
        q, g = _qg(rng, q=16, g=2100, d=64)
        vb, ib = cosine_topk(q, g, 10, method="fused",
                             matmul_dtype="bfloat16", interpret=True)
        vf, if_ = cosine_topk(q, g, 10, method="fused", interpret=True)
        assert (np.asarray(ib)[:, 0] == np.asarray(if_)[:, 0]).mean() > 0.9
        np.testing.assert_allclose(np.asarray(vb), np.asarray(vf),
                                   rtol=0, atol=2e-2)

    def test_exact_dispatch_stays_dense_on_cpu(self, rng):
        # method='exact' without interpret must not pick the Pallas path on
        # a CPU backend (compile-time dispatch)
        q, g = self._int_qg(rng, q=4, g=2100)
        v, i = cosine_topk(jnp.asarray(q), jnp.asarray(g), 10)
        rv, ri = jax.lax.top_k(
            l2_normalize(jnp.asarray(q)) @ l2_normalize(jnp.asarray(g)).T,
            10)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


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


class TestPrecision:
    """The matmul-precision knob (VERDICT r4 task 2).

    On TPU, precision='default' scores nominal-f32 matmuls with one
    bf16-truncated MXU pass; 'highest' runs the multi-pass f32-faithful
    algorithm (reference torch-f32 score parity). On CPU both are true
    f32, so these tests pin the PLUMBING (same program semantics, bitwise
    identical results, validation); the on-chip agreement/cost study is
    tools/precision_agreement.py, recorded in PERF.md.
    """

    def test_cpu_default_equals_highest_bitwise(self, rng):
        q, g = _qg(rng)
        v0, i0 = cosine_topk(q, g, 10)
        v1, i1 = cosine_topk(q, g, 10, precision="highest")
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_fused_interpret_highest_matches_dense_highest(self, rng):
        q, g = _qg(rng, q=24, g=2100)
        v1, i1 = cosine_topk(q, g, 10, method="fused", interpret=True,
                             precision="highest")
        v2, i2 = cosine_topk(q, g, 10, method="dense",
                             precision="highest")
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-6, atol=1e-6)

    def test_highest_rejected_for_quantized_modes(self, rng):
        q, g = _qg(rng)
        for dtype in ("bfloat16", "int8"):
            with pytest.raises(ValueError, match="float32 score path"):
                cosine_topk(q, g, 5, matmul_dtype=dtype,
                            precision="highest")

    def test_unknown_precision_rejected(self, rng):
        q, g = _qg(rng)
        with pytest.raises(ValueError, match="unknown precision"):
            cosine_topk(q, g, 5, precision="tf32")

    def test_cosine_scores_precision(self, rng):
        q, g = _qg(rng)
        s0 = np.asarray(cosine_scores(q, g))
        s1 = np.asarray(cosine_scores(q, g, precision="highest"))
        np.testing.assert_array_equal(s0, s1)


class TestInt8Rerank:
    """The certified two-stage int8 serving mode (VERDICT r4 task 3):
    int8 fused shortlist -> two-level-dequantized f32-faithful re-rank.
    CPU tests pin exactness of the machinery; the at-scale (1M) fidelity
    and throughput study is tools/rerank_scale.py, recorded in PERF.md."""

    def _prep(self, rng, g_rows, d=64):
        from imageretrievalresearch_tpu.ops.retrieval import (
            quantize_rows_int8_residual,
        )
        g = rng.normal(size=(g_rows, d)).astype(np.float32)
        q = rng.normal(size=(40, d)).astype(np.float32)
        return q, g, quantize_rows_int8_residual(l2_normalize(
            jnp.asarray(g)))

    def test_two_level_reconstruction_beats_int8(self, rng):
        from imageretrievalresearch_tpu.ops.retrieval import (
            quantize_rows_int8_residual,
        )
        x = l2_normalize(jnp.asarray(
            rng.normal(size=(200, 96)).astype(np.float32)))
        c1, s1, c2, s2, g1m, rm = quantize_rows_int8_residual(x)
        rec2 = (np.asarray(c1, np.float32) * np.asarray(s1)
                + np.asarray(c2, np.float32) * np.asarray(s2))
        rec1 = np.asarray(c1, np.float32) * np.asarray(s1)
        e2 = np.abs(rec2 - np.asarray(x)).max()
        e1 = np.abs(rec1 - np.asarray(x)).max()
        assert e2 < e1 / 100          # ~254x by design
        assert e2 < 2e-5
        # the certificate's norm bounds really bound the row norms
        assert np.linalg.norm(rec1, axis=1).max() <= float(g1m) + 1e-6
        assert np.linalg.norm(np.asarray(x) - rec1,
                              axis=1).max() <= float(rm) + 1e-6

    def test_matches_f32_exact_ranking(self, rng):
        from imageretrievalresearch_tpu.ops.retrieval import (
            int8_rerank_topk,
        )
        q, g, (c1, s1, c2, s2, g1m, rm) = self._prep(rng, 3000)
        v, i, m = int8_rerank_topk(jnp.asarray(q), c1, s1, c2, s2, 10,
                                   shortlist=64)
        vr, ir = cosine_topk(q, g, 10)           # true f32 on CPU
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr),
                                   atol=5e-5)

    def test_fused_interpret_stage1(self, rng):
        from imageretrievalresearch_tpu.ops.retrieval import (
            int8_rerank_topk,
        )
        q, g, (c1, s1, c2, s2, g1m, rm) = self._prep(rng, 2100)
        v, i, m = int8_rerank_topk(jnp.asarray(q), c1, s1, c2, s2, 10,
                                   shortlist=256, interpret=True)
        vr, ir = cosine_topk(q, g, 10)
        assert float((np.asarray(i)[:, 0]
                      == np.asarray(ir)[:, 0]).mean()) == 1.0

    def test_certificate_soundness(self, rng):
        """Rows whose signed margin certifies (> 0) must equal the exact
        full-gallery top-k of the two-level refined scores."""
        from imageretrievalresearch_tpu.ops.retrieval import (
            int8_rerank_topk, quantize_rows_int8,
        )
        q, g, (c1, s1, c2, s2, g1m, rm) = self._prep(rng, 3000)
        v, i, m = int8_rerank_topk(jnp.asarray(q), c1, s1, c2, s2, 10,
                                   shortlist=32,   # small: stress misses
                                   gallery_norm_bound=g1m,
                                   residual_norm_bound=rm)
        # dense full-gallery refined reference (same arithmetic)
        q_hat = l2_normalize(jnp.asarray(q))
        rec = (np.asarray(c1, np.float32) * np.asarray(s1)
               + np.asarray(c2, np.float32) * np.asarray(s2))
        sims = np.asarray(q_hat) @ rec.T
        ref_i = np.argsort(-sims, axis=1, kind="stable")[:, :10]
        cert = np.asarray(m) > 0
        assert cert.any()             # the bound is useful at this scale
        np.testing.assert_array_equal(np.asarray(i)[cert], ref_i[cert])

    def test_shortlist_at_least_k_and_clamped(self, rng):
        from imageretrievalresearch_tpu.ops.retrieval import (
            int8_rerank_topk,
        )
        q, g, (c1, s1, c2, s2, g1m, rm) = self._prep(rng, 300)
        # shortlist < k silently raised to k; shortlist > G clamped
        v, i, m = int8_rerank_topk(jnp.asarray(q), c1, s1, c2, s2, 20,
                                   shortlist=8)
        assert v.shape == (40, 20)
        v2, i2, m2 = int8_rerank_topk(jnp.asarray(q), c1, s1, c2, s2, 20,
                                      shortlist=4096)
        vr, ir = cosine_topk(q, g, 20)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ir))


def test_pack_codes_int32_bit_exact(rng):
    """The packed-int32 residual form (the stage-2 gather speed fix —
    TPU gather cost scales with element count) round-trips bit-exactly,
    on both the numpy (host/serving) and traced paths, including
    negative code values."""
    from imageretrievalresearch_tpu.ops.retrieval import (
        _unpack_codes_int32,
        pack_codes_int32,
    )
    codes = rng.integers(-127, 128, (97, 64), dtype=np.int8)
    packed_np = pack_codes_int32(codes)           # numpy view
    packed_jx = pack_codes_int32(jnp.asarray(codes))
    assert packed_np.shape == (97, 16) and packed_np.dtype == np.int32
    np.testing.assert_array_equal(packed_np, np.asarray(packed_jx))
    idx = jnp.asarray(rng.integers(0, 97, (5, 13)))
    rows = _unpack_codes_int32(jnp.asarray(packed_np)[idx])
    np.testing.assert_array_equal(np.asarray(rows),
                                  codes[np.asarray(idx)])
    with pytest.raises(ValueError):
        pack_codes_int32(codes[:, :63])           # D not a multiple of 4


def test_gallery_norms_bit_identical(rng):
    """The precomputed-norms serving form (skips the per-call gallery
    norm pass) ranks bit-identically to the per-call path, on both the
    fused-interpret and dense routes."""
    from imageretrievalresearch_tpu.ops.retrieval import (
        cosine_topk,
        fused_cosine_topk_pallas,
        l2_normalize,
    )
    g = jnp.asarray(rng.normal(size=(2300, 64)).astype(np.float32)) * 3
    q = l2_normalize(jnp.asarray(
        rng.normal(size=(64, 64)).astype(np.float32)))
    gn = jnp.linalg.norm(g, axis=1)
    va, ia, _ = fused_cosine_topk_pallas(q, g, 10, interpret=True)
    vb, ib, _ = fused_cosine_topk_pallas(q, g, 10, gallery_norms=gn,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    vc, ic = cosine_topk(q, g, 10, method="dense")
    vd, idd = cosine_topk(q, g, 10, method="dense", gallery_norms=gn)
    np.testing.assert_array_equal(np.asarray(ic), np.asarray(idd))
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(vd))
