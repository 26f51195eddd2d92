"""Fused gallery retrieval: cosine-similarity matmul + top-k, TPU-first.

The reference ranks galleries with an eager per-query Python loop
(``for idx, fm in enumerate(fms_ims_all): topk(cos(fm, fms_poss_all), k=150)``,
inference/training_analysis.ipynb cell 2; same shape at
inference/inference.py:223-242 and the in-batch loop train/train.py:249-255).
Here the whole ranking is one compiled program:

1. L2-normalize queries and gallery (torch CosineSimilarity eps semantics).
2. Blockwise ``Q·Gᵀ`` on the MXU — optionally via a Pallas kernel that fuses
   the gallery normalization into the matmul epilogue so the normalized
   gallery is never materialized in HBM.
3. Two-stage top-k: per-chunk ``lax.top_k`` then a merge top-k — avoids
   XLA's full-width sort over 100k columns, which dominates at large G.

Queries are processed in fixed-size blocks under ``lax.map`` so HBM use is
O(query_block × G), letting 100k+ galleries stream (BASELINE.json config #5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageretrievalresearch_tpu.losses import COSINE_SIM_EPS


def l2_normalize(x: jax.Array, *, eps: float = COSINE_SIM_EPS) -> jax.Array:
    """Row-normalize so that q̂·ĝ == torch cosine sim: each norm clamped at
    eps, exactly torch >= 1.12's per-norm clamping
    (``dot / (max(|q|, eps) * max(|g|, eps))``, pytorch PR 74469 — the
    semantics ``losses.cosine_similarity`` transcribes)."""
    x = x.astype(jnp.float32)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot_precision(precision: str):
    """Map the public precision knob to a lax dot precision.

    On TPU, JAX's DEFAULT precision computes nominal-f32 matmuls with
    bf16-TRUNCATED multiplies on the MXU (one pass; ~3x the true-f32
    rate). ``'highest'`` requests XLA's multi-pass f32-faithful algorithm
    (bf16_6x decomposition, f32 accumulation — scores match a true f32
    matmul to ~1e-7 relative, i.e. the reference's torch CPU/CUDA f32
    cosine scores up to accumulation order). On CPU both settings are
    true f32. Default stays 'default': it is ~3x faster and the measured
    ranking gap is confined to near-ties (see PERF.md 'Matmul precision').
    """
    if precision == "default":
        return None
    if precision == "highest":
        return jax.lax.Precision.HIGHEST
    raise ValueError(f"unknown precision {precision!r}; "
                     "expected 'default' or 'highest'")


def _check_precision(precision: str, matmul_dtype: str) -> None:
    _dot_precision(precision)  # validate the name
    if precision != "default" and matmul_dtype != "float32":
        # bf16/int8 modes define their own (input-rounded) arithmetic;
        # silently accepting 'highest' there would misreport what ran
        raise ValueError("precision='highest' applies to the float32 "
                         f"score path only, not matmul_dtype="
                         f"{matmul_dtype!r}")


def chunked_topk(sims: jax.Array, k: int, *, chunk: int = 2048
                 ) -> tuple[jax.Array, jax.Array]:
    """Two-stage top-k over the last axis of (B, G).

    Stage 1 takes top-k within each ``chunk``-wide slice; stage 2 merges the
    B × (G/chunk × k) candidates. Equivalent to ``lax.top_k(sims, k)`` but
    avoids a full-width sort (ties broken by index order within stages,
    matching torch.topk's stable largest-first semantics for distinct values).
    """
    b, g = sims.shape
    if g <= chunk or g <= k:
        vals, inds = jax.lax.top_k(sims, min(k, g))
        return vals, inds
    n_chunks = -(-g // chunk)
    pad = n_chunks * chunk - g
    if pad:
        sims = jnp.pad(sims, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    s = sims.reshape(b, n_chunks, chunk)
    kk = min(k, chunk)
    vals, inds = jax.lax.top_k(s, kk)                    # (B, n_chunks, kk)
    base = (jnp.arange(n_chunks, dtype=inds.dtype) * chunk)[None, :, None]
    inds = inds + base
    vals = vals.reshape(b, n_chunks * kk)
    inds = inds.reshape(b, n_chunks * kk)
    mvals, mpos = jax.lax.top_k(vals, k)                 # (B, k)
    minds = jnp.take_along_axis(inds, mpos, axis=1)
    return mvals, minds


# ---------------------------------------------------------------------------
# Pallas fused kernel: normalize-gallery + matmul scores
# ---------------------------------------------------------------------------

def _scores_kernel(q_ref, g_ref, out_ref, *, dot_precision=None):
    """One (Q_TILE, G_TILE) score block: normalize the gallery tile in VMEM,
    then MXU matmul against pre-normalized queries."""
    g = g_ref[:].astype(jnp.float32)                     # (G_TILE, D)
    norm = jnp.sqrt(jnp.sum(g * g, axis=1, keepdims=True))
    g_hat = g / jnp.maximum(norm, COSINE_SIM_EPS)
    q = q_ref[:].astype(jnp.float32)                     # (Q_TILE, D)
    out_ref[:] = jax.lax.dot_general(
        q, g_hat, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=dot_precision,
        preferred_element_type=jnp.float32)


def pallas_cosine_scores(queries_hat: jax.Array, gallery: jax.Array,
                         *, q_tile: int = 128, g_tile: int = 512,
                         precision: str = "default",
                         interpret: bool = False) -> jax.Array:
    """(Q, D) normalized queries × (G, D) raw gallery -> (Q, G) cosine sims.

    Fuses the gallery L2-normalization into the score kernel so ĝ never
    round-trips through HBM. D is kept whole per tile (embedding dims here
    are 1280-1920 floats — a (512, 1920) f32 tile is ~3.9 MB, well within
    VMEM with double buffering).
    """
    q, d = queries_hat.shape
    g = gallery.shape[0]
    qp, gp = _round_up(q, q_tile), _round_up(g, g_tile)
    qh = jnp.pad(queries_hat.astype(jnp.float32), ((0, qp - q), (0, 0)))
    gh = jnp.pad(gallery.astype(jnp.float32), ((0, gp - g), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_scores_kernel,
                          dot_precision=_dot_precision(precision)),
        grid=(qp // q_tile, gp // g_tile),
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, g_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, gp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * gp * d + 3 * gp * d,
            bytes_accessed=(qp * d + gp * d + qp * gp) * 4,
            transcendentals=0),
        interpret=interpret,
    )(qh, gh)
    return out[:q, :g]


# ---------------------------------------------------------------------------
# Pallas fused kernel: normalize + matmul + streaming EXACT top-k
# ---------------------------------------------------------------------------
#
# The north-star retrieval kernel (BASELINE.json): the (Q, G) score matrix is
# never materialized in HBM. Design (sort-free — XLA's sort-based top_k has a
# ~26 ms floor at Q=2048 on v5e even for 512-wide inputs):
#
# 1. Gallery tiles of GT rows stream through VMEM; scores for a (QT, GT)
#    tile come off the MXU and are divided by precomputed gallery norms.
# 2. Bins: gallery item g belongs to bin (g mod GT), so each tile holds
#    exactly one member of every bin. A per-bin top-T running buffer
#    (QT, T, GT) lives in VMEM scratch and is updated with a T-deep
#    compare/swap insertion chain (pure VPU, no sort, stable ties).
# 3. Epilogue (last gallery tile): the exact top-k is extracted from the
#    T*GT candidates by k max+mask passes in VMEM, ties broken by lowest
#    global index (torch.topk / lax.top_k order).
# 4. Exactness certificate: the result equals lax.top_k iff no bin needed
#    more than its T stored values, i.e. max_bins(T-th value) < k-th
#    extracted value. The certificate is returned per query row; the
#    public wrapper repairs failing rows via the bounded dense re-rank in
#    certified_topk_repair. Failure probability under a uniform spread of
#    the true top-k over bins (k=150, T=6, BINS=512): per bin
#    P(Binom(150, 1/512) > 6) = 2.5e-8, union bound over 512 bins
#    ≈ 1.3e-5 per query row. Adversarial consecutive duplicates land in
#    distinct bins by construction of g mod BINS.
#
# Reference semantics preserved: training_analysis.ipynb cell 2
# ``topk(cos(fm, fms_poss_all), k=150)``.


def _stream_topk_update(s, j, nj, vals_out, inds_out, ok_out,
                        bufv_ref, bufi_ref, *, k: int, t_depth: int,
                        g_real: int):
    """Shared streaming-top-k state machine: fold one (QT, F*BINS) score
    tile into the per-bin buffers (F sub-tiles of BINS lanes each — wider
    tiles amortize the per-grid-step overhead that dominates this kernel);
    extract + certify on the last tile. BINS is the buffer lane width."""
    qt, st = s.shape
    bins = bufv_ref.shape[1] // t_depth
    fold = st // bins

    for f in range(fold):
        sub = s[:, f * bins:(f + 1) * bins]
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, bins), 1)
        idx = j * st + f * bins + lane
        sub = jnp.where(idx < g_real, sub, -jnp.inf)        # mask padding

        # insertion chain: new value sinks below equal/greater stored
        # values, so ties keep the earlier (lower global index) entry on
        # top. The (QT, t_depth * BINS) buffers hold depth t in lane block
        # t (all shapes strictly 2-D: Mosaic layout inference rejects
        # 1-D/3-D forms).
        cur_v, cur_i = sub, idx
        for t in range(t_depth):
            sl = slice(t * bins, (t + 1) * bins)
            old_v = bufv_ref[:, sl]
            old_i = bufi_ref[:, sl]
            take = cur_v > old_v
            bufv_ref[:, sl] = jnp.where(take, cur_v, old_v)
            bufi_ref[:, sl] = jnp.where(take, cur_i, old_i)
            cur_v = jnp.where(take, old_v, cur_v)
            cur_i = jnp.where(take, old_i, cur_i)

    gt = bins  # buffer/epilogue lane width

    @pl.when(j == nj - 1)
    def _epilogue():
        int_max = jnp.iinfo(jnp.int32).max
        # certificate part 1: deepest stored value per row, before
        # extraction mutates the buffer
        tth = jnp.max(bufv_ref[:, (t_depth - 1) * gt:], axis=1,
                      keepdims=True)                           # (QT, 1)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

        def extract(n, thr):
            # single full-width pass per rank: a slice-per-depth variant
            # (smaller stack temps) measured ~10 ms SLOWER end-to-end —
            # the k max+mask passes are this kernel's hottest loop
            bv = bufv_ref[:]
            bi = bufi_ref[:]
            m = jnp.max(bv, axis=1, keepdims=True)             # (QT, 1)
            is_m = bv == m
            mi = jnp.min(jnp.where(is_m, bi, int_max), axis=1,
                         keepdims=True)                        # (QT, 1)
            hit = (kiota == n)
            vals_out[:] = jnp.where(hit, m, vals_out[:])
            inds_out[:] = jnp.where(hit, mi, inds_out[:])
            bufv_ref[:] = jnp.where(is_m & (bi == mi), -jnp.inf, bv)
            return m

        vals_out[:] = jnp.zeros_like(vals_out)
        inds_out[:] = jnp.zeros_like(inds_out)
        thr = jax.lax.fori_loop(0, k, extract,
                                jnp.full((qt, 1), jnp.inf, jnp.float32))
        ok_out[:] = (tth < thr).astype(jnp.int32)


def _fused_topk_kernel(q_ref, g_ref, gnorm_ref, vals_out, inds_out, ok_out,
                       bufv_ref, bufi_ref, *, k: int, t_depth: int,
                       g_real: int, dot_precision=None):
    """f32 variant: raw gallery tiles + norms stream in; normalize the tile
    BEFORE the matmul — the same arithmetic order as the dense path
    (l2_normalize(gallery) then dot), so scores agree with the dense
    fallback and near-tie rankings match lax.top_k of the same-precision
    scores. ``dot_precision=None`` (the default knob) runs the MXU's
    one-pass bf16-truncated f32 matmul; ``Precision.HIGHEST`` runs the
    multi-pass f32-faithful algorithm (~torch f32 scores)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bufv_ref[:] = jnp.full_like(bufv_ref, -jnp.inf)
        bufi_ref[:] = jnp.zeros_like(bufi_ref)

    g_hat = g_ref[:].astype(jnp.float32) / jnp.maximum(
        gnorm_ref[:], COSINE_SIM_EPS)                       # (GT, D)/(GT, 1)
    s = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32), g_hat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=dot_precision,
        preferred_element_type=jnp.float32)
    _stream_topk_update(s, j, pl.num_programs(1), vals_out, inds_out, ok_out,
                        bufv_ref, bufi_ref, k=k, t_depth=t_depth,
                        g_real=g_real)


def _fused_topk_kernel_bf16(q_ref, g_ref, vals_out, inds_out, ok_out,
                            bufv_ref, bufi_ref, *, k: int, t_depth: int,
                            g_real: int):
    """bf16 variant: the gallery is pre-normalized-and-cast OUTSIDE the
    kernel (one fused XLA pass), so tiles stream at half the HBM bytes and
    there is no norm input; the matmul is a single bf16 MXU pass with f32
    accumulation — the same arithmetic as the dense
    ``matmul_dtype='bfloat16'`` path, so the lax.cond fallback ranks
    identically."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bufv_ref[:] = jnp.full_like(bufv_ref, -jnp.inf)
        bufi_ref[:] = jnp.zeros_like(bufi_ref)

    s = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _stream_topk_update(s, j, pl.num_programs(1), vals_out, inds_out, ok_out,
                        bufv_ref, bufi_ref, k=k, t_depth=t_depth,
                        g_real=g_real)


def _fused_topk_kernel_int8(q_ref, g_ref, qs_ref, gs_ref, vals_out, inds_out,
                            ok_out, bufv_ref, bufi_ref, *, k: int,
                            t_depth: int, g_real: int):
    """int8 variant: per-row symmetrically quantized normalized embeddings
    stream at a QUARTER of the f32 bytes (the kernel is stream-bound — see
    PERF.md ceilings); the matmul runs on the MXU's int8 path with int32
    accumulation, then scores are rescaled to f32 by the outer product of
    the per-row scales. Top-k is exact for the quantized scores; the same
    arithmetic is used by the dense fallback so rankings agree."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        bufv_ref[:] = jnp.full_like(bufv_ref, -jnp.inf)
        bufi_ref[:] = jnp.zeros_like(bufi_ref)

    s32 = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (qs_ref[:] * gs_ref[:].reshape(1, -1))
    _stream_topk_update(s, j, pl.num_programs(1), vals_out, inds_out, ok_out,
                        bufv_ref, bufi_ref, k=k, t_depth=t_depth,
                        g_real=g_real)


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: returns (values, scales) with
    ``x ≈ values * scales``; scales shaped (N, 1) f32."""
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True),
                        1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows_int8_residual(x: jax.Array) -> tuple[
        jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Two-level per-row int8 quantization for the ``int8_rerank`` serving
    mode: primary codes exactly as :func:`quantize_rows_int8` (so stage 1
    streams the SAME bytes/arithmetic as pure int8 serving), plus int8
    codes of the residual ``x - primary``. Residual scale is ~primary/254,
    so two-level reconstruction error is ~254x below single-level int8 —
    far below bf16 input rounding — at bf16's total bytes (2/row-elem).

    Returns ``(codes, scales, res_codes, res_scales, max_primary_norm,
    max_residual_norm)``; the two scalars are ``max_rows ||dequant(row)||``
    and ``max_rows ||residual(row)||``, precomputed here because the
    re-rank recall certificate needs them per call and recomputing them
    would re-stream the full gallery (see :func:`int8_rerank_topk`).
    """
    x = x.astype(jnp.float32)
    q1, s1 = quantize_rows_int8(x)
    deq1 = q1.astype(jnp.float32) * s1
    resid = x - deq1
    q2, s2 = quantize_rows_int8(resid)
    g1max = jnp.max(jnp.linalg.norm(deq1, axis=1))
    rmax = jnp.max(jnp.linalg.norm(resid, axis=1))
    return q1, s1, q2, s2, g1max, rmax


def _int8_scores(qq, qs, gq, gs):
    """Dense-path score arithmetic for int8 mode (must match the kernel)."""
    s32 = jax.lax.dot_general(qq, gq,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return s32.astype(jnp.float32) * (qs * gs.reshape(1, -1))


def _check_prepared(gallery, matmul_dtype, gallery_scale):
    """A non-f32 gallery dtype signals a PRE-PREPARED gallery (bf16 =
    already L2-normalized + cast; int8 = already normalized + per-row
    quantized, scales required). Enforce mode/dtype agreement so a
    prepared gallery can't silently score with the wrong arithmetic."""
    if gallery.dtype == jnp.bfloat16 and matmul_dtype != "bfloat16":
        raise ValueError("bfloat16 (pre-normalized) gallery requires "
                         "matmul_dtype='bfloat16'")
    if gallery.dtype == jnp.int8:
        if matmul_dtype != "int8":
            raise ValueError("int8 (pre-quantized) gallery requires "
                             "matmul_dtype='int8'")
        if gallery_scale is None:
            raise ValueError("int8 gallery requires gallery_scale (G, 1)")


def _prepare_gallery(gallery, matmul_dtype, gallery_scale=None):
    """Normalize/quantize a gallery into the form the score arithmetic
    consumes (pass-through for already-prepared inputs). Returns
    ``(prepared, scale_or_None)``."""
    if matmul_dtype == "int8":
        if gallery.dtype == jnp.int8:
            return gallery, gallery_scale
        return quantize_rows_int8(l2_normalize(gallery))
    if matmul_dtype == "bfloat16":
        if gallery.dtype == jnp.bfloat16:
            return gallery, None
        return l2_normalize(gallery).astype(jnp.bfloat16), None
    return l2_normalize(gallery), None


def _scores_prepared(q_hat, g_prep, g_scale, matmul_dtype,
                     precision: str = "default"):
    if matmul_dtype == "int8":
        qq, qs = quantize_rows_int8(q_hat)
        return _int8_scores(qq, qs, g_prep, g_scale)
    if matmul_dtype == "bfloat16":
        return jax.lax.dot_general(
            q_hat.astype(jnp.bfloat16), g_prep,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        q_hat, g_prep, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_dot_precision(precision),
        preferred_element_type=jnp.float32)


def dense_scores(q_hat, gallery, matmul_dtype, gallery_scale=None,
                 precision: str = "default"):
    """The ONE definition of the dense score arithmetic per matmul_dtype —
    used by the dense ranking path, the certificate-repair path, and the
    sharded per-shard fallback. It must match the fused kernels exactly
    (the lax.cond fallback contract); accepts raw f32 or pre-prepared
    (bf16 normalized / int8 quantized + scales) galleries. ``precision``
    (f32 mode only) follows :func:`_dot_precision`: 'default' = one-pass
    bf16-truncated MXU multiplies on TPU, 'highest' = f32-faithful."""
    g_prep, gs = _prepare_gallery(gallery, matmul_dtype, gallery_scale)
    return _scores_prepared(q_hat, g_prep, gs, matmul_dtype, precision)


# Default kernel geometry (round-4 pipelined-timing sweep, 100k x 1536,
# Q=2048, k=150 on chip — the round-3 sweep that settled on q_tile=256
# was per-call timed, where the ~25 ms tunnel RTT hid these differences):
#   q256 g512 t6 (old):  11.6 ms          q512 g256 t8:  9.3 ms
#   q512 g512 t6:         8.9 ms f32 / 7.9 bf16 / 6.5 int8, cert 1.0000
# q_tile=512 halves the gallery re-streams (4 q-tiles, not 8); the
# winning config needs ~22 MB of scoped VMEM, past Mosaic's 16 MB
# default budget — raised via compiler_params below (v5e has 128 MB
# physical). Larger q tiles (1024/2048) gain nothing further: with 4
# tiles the re-stream DMA already overlaps compute. q_tile adapts down
# for small query batches so serving-sized requests don't pad to 512.
# Round-5 attribution (tools/profile_fused_kernel.py): the kernel itself
# is 7.0 ms (DMA 4.6 / matmul +0.2 / insertion +0.4 / extraction +1.75);
# the old 9.0 ms call carried a per-call 616 MB gallery PAD copy (now
# removed — Mosaic partial blocks + the g_real mask make it redundant)
# and a per-call norm recompute (now optional via gallery_norms).
FUSED_G_TILE = 512
FUSED_T_DEPTH = 6
FUSED_Q_TILE_MAX = 512
FUSED_VMEM_BUDGET = 64 * 1024 * 1024   # v5e: 128 MB physical


def fused_cosine_topk_pallas(
        queries_hat: jax.Array, gallery: jax.Array, k: int,
        *, q_tile: int | None = None, g_tile: int = FUSED_G_TILE,
        t_depth: int = FUSED_T_DEPTH,
        matmul_dtype: str = "float32", gallery_scale: jax.Array | None = None,
        gallery_norms: jax.Array | None = None,
        precision: str = "default",
        fold: int | None = None,
        interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(Q, D) normalized queries x (G, D) raw gallery -> exact top-k
    ``(vals, inds, ok)`` with per-row exactness certificate ``ok``.

    Rows with ``ok == 0`` (a bin overflowed its T-deep buffer, or a value
    tie straddles the k-th position) must be re-ranked by a dense method —
    see :func:`cosine_topk`, which wraps this with a lax.cond fallback.

    ``matmul_dtype='bfloat16'``: the gallery is L2-normalized and cast to
    bf16 in one fused XLA pass, then streamed at half the HBM bytes; the
    score matmul is a single bf16 MXU pass with f32 accumulation (an f32
    matmul costs ~3 bf16 passes on v5e). The top-k is still exact *for the
    bf16-rounded scores*; ranking differs from f32 only on near-ties
    within bf16 input rounding (~1e-2 relative on unit vectors).
    """
    if matmul_dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown matmul_dtype {matmul_dtype!r}")
    _check_prepared(gallery, matmul_dtype, gallery_scale)
    _check_precision(precision, matmul_dtype)
    q, d = queries_hat.shape
    g = gallery.shape[0]
    if q_tile is None:
        q_tile = min(FUSED_Q_TILE_MAX, _round_up(q, 256))
    assert k <= t_depth * g_tile, (k, t_depth, g_tile)
    bf16 = matmul_dtype == "bfloat16"
    int8 = matmul_dtype == "int8"
    # fold = gallery tiles folded into one grid step (bin width stays
    # g_tile). Re-swept round 5 with pipelined timing after the nopad +
    # 64 MB-budget changes: fold 2/4/8 move int8/bf16 by <=5% at 100k AND
    # 1M (grid-step overhead is NOT what bounds the compact dtypes — the
    # per-score insertion-chain VPU work is, and that is fold-invariant).
    # Default stays 1; the knob remains for future geometry experiments.
    if fold is None:
        fold = 1
    assert fold >= 1
    g_block = fold * g_tile
    qp, gp = _round_up(q, q_tile), _round_up(g, g_block)
    qh = jnp.pad(queries_hat.astype(jnp.float32), ((0, qp - q), (0, 0)))

    grid = (qp // q_tile, gp // g_block)
    common = dict(
        out_specs=(
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
            jax.ShapeDtypeStruct((qp, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((q_tile, t_depth * g_tile), jnp.float32),
            pltpu.VMEM((q_tile, t_depth * g_tile), jnp.int32),
        ],
        interpret=interpret,
    )
    if not interpret:
        # the q512/g512/t6 geometry needs ~22 MB of scoped VMEM, past
        # Mosaic's default 16 MB budget; v5e has 128 MB physical — raise
        # the budget so tile choice is set by measurement, not the cap
        common["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=FUSED_VMEM_BUDGET)
    # Gallery-side inputs are passed UNPADDED: Mosaic handles a final
    # partial block itself, and the kernels mask every out-of-range lane
    # by ``idx < g_real``. Padding here was a full per-call gallery
    # read+write copy — dropping it took the production f32 call from
    # 9.0 to 7.3 ms at 100k x 1536 (tools/profile_fused_kernel.py notes;
    # results bit-identical). The interpret (CPU test) path still pads:
    # pallas interpret mode zero-fills partial blocks, but a zero norm
    # row would hit the eps clamp differently than Mosaic's undefined
    # tail, and interpret correctness must be exact.
    # precision='highest' (the bf16_6x multi-pass dot) also pads: Mosaic's
    # compile of a HIGHEST dot over a PARTIAL boundary block hangs
    # indefinitely on this toolchain (reproduced twice on chip, round 5 —
    # a 100k unpadded HIGHEST call never returned where padded takes
    # ~26 ms). HIGHEST is the 2.8x-slower parity path, so the one extra
    # pad copy is acceptable there.
    must_pad = interpret or (matmul_dtype == "float32"
                             and precision == "highest")

    def gpad(a, fill=0):
        if not must_pad or gp == g:
            return a
        return jnp.pad(a, ((0, gp - g), (0, 0)), constant_values=fill)

    if int8:
        qq, qs = quantize_rows_int8(qh)
        if gallery.dtype == jnp.int8:
            gq = gpad(gallery)
            gs = gpad(gallery_scale.astype(jnp.float32), 1.0)
        else:
            gq, gs = quantize_rows_int8(l2_normalize(gallery))
            gq, gs = gpad(gq), gpad(gs, 1.0)
        kernel = functools.partial(_fused_topk_kernel_int8, k=k,
                                   t_depth=t_depth, g_real=g)
        vals, inds, ok = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_block, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_block, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * qp * gp * d,
                bytes_accessed=qp * d + gp * d + (qp + gp + qp * 2 * k) * 4,
                transcendentals=0),
            **common,
        )(qq, gq, qs, gs)
        return vals[:q], inds[:q], ok[:q, 0]
    if bf16:
        if gallery.dtype == jnp.bfloat16:   # pre-normalized serving form
            g_hat = gpad(gallery)
        else:
            g_hat = gpad(l2_normalize(gallery))
        kernel = functools.partial(_fused_topk_kernel_bf16, k=k,
                                   t_depth=t_depth, g_real=g)
        vals, inds, ok = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_block, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * qp * gp * d,
                bytes_accessed=qp * d * 2 + gp * d * 2 + qp * 2 * k * 4,
                transcendentals=0),
            **common,
        )(qh.astype(jnp.bfloat16), g_hat.astype(jnp.bfloat16))
    else:
        gh = gpad(gallery.astype(jnp.float32))
        if gallery_norms is not None:
            # serving form: norms precomputed at gallery-build time — the
            # per-call norm recompute is one extra full gallery read
            gnorm = gpad(gallery_norms.reshape(-1, 1), 1.0)
        else:
            gnorm = jnp.linalg.norm(gh, axis=1)[:, None]
        kernel = functools.partial(_fused_topk_kernel, k=k, t_depth=t_depth,
                                   g_real=g,
                                   dot_precision=_dot_precision(precision))
        vals, inds, ok = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_tile, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((g_tile, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * qp * gp * d,
                bytes_accessed=(qp * d + gp * d + gp + qp * 2 * k) * 4,
                transcendentals=0),
            **common,
        )(qh, gh, gnorm)
    return vals[:q], inds[:q], ok[:q, 0]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _fused_eligible(q: int, g: int, d: int, k: int,
                    g_tile: int, t_depth: int) -> bool:
    """Fused-kernel guard: enough queries AND gallery to amortize, D fits
    VMEM tiles, k fits the candidate buffer.

    The q >= 32 floor is measured (tools/serving_latency.py, 100k x 1536
    gallery, k=150 on chip): below ~32 queries the dense blocked path wins
    (Q=1: 2.9 ms vs 4.4 ms fused — one small matmul beats the kernel's
    per-grid-step insertion chain) and both paths are exact, so serving-
    sized requests route dense automatically."""
    return (q >= 32 and g >= 4 * g_tile and d <= 2048
            and k <= t_depth * g_tile and k <= 1024)


def certified_topk_repair(q_hat, gallery, k, vals, inds, ok, *,
                          matmul_dtype, gallery_scale, full_fallback,
                          precision: str = "default"):
    """Bounded certificate repair shared by the single-device
    (:func:`cosine_topk`) and sharded (``parallel.gallery``) fused paths.

    Row failures are rare (~1.3e-5/row for k=150, t=6, bins=512 under a
    uniform top-k spread — the union-bound derivation in the kernel
    header) but DETERMINISTIC per dataset: a whole-gallery
    dense fallback would re-pay the full (Q, G) matmul on EVERY call for
    one bad row (the ~3.7x cliff measured in PERF.md). Instead up to RETRY
    failing rows are re-ranked densely through the same score arithmetic
    (a (RETRY, G) matmul, ~1-2 ms) and scattered back;
    ``full_fallback()`` — the caller's full dense pass — runs only beyond
    that (P astronomically small, or adversarial ties)."""
    q = q_hat.shape[0]
    RETRY = min(64, q)
    bad = (ok == 0).astype(jnp.int32)
    n_bad = jnp.sum(bad)

    def repair(_):
        # indices of up to RETRY failing rows (ties padded by index order;
        # surplus slots harmlessly re-rank row 0)
        _, rows = jax.lax.top_k(bad, RETRY)
        sub = q_hat[rows]                                # (RETRY, D)
        sims = dense_scores(sub, gallery, matmul_dtype, gallery_scale,
                            precision)
        rvals, rinds = chunked_topk(sims, k)
        keep = (jnp.arange(RETRY) < n_bad)[:, None]
        return (vals.at[rows].set(jnp.where(keep, rvals, vals[rows])),
                inds.at[rows].set(jnp.where(keep, rinds, inds[rows])))

    return jax.lax.cond(
        n_bad == 0,
        lambda _: (vals, inds),
        lambda _: jax.lax.cond(n_bad <= RETRY, repair,
                               lambda __: full_fallback(), _),
        None)


@functools.partial(jax.jit,
                   static_argnames=("k", "query_block", "use_pallas",
                                    "interpret", "method", "recall_target",
                                    "matmul_dtype", "precision"))
def cosine_topk(queries: jax.Array, gallery: jax.Array, k: int,
                *, query_block: int = 512, use_pallas: bool = False,
                interpret: bool = False, method: str = "exact",
                recall_target: float = 0.95,
                matmul_dtype: str = "float32",
                gallery_scale: jax.Array | None = None,
                gallery_norms: jax.Array | None = None,
                precision: str = "default"
                ) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine retrieval: (Q, D) × (G, D) -> (vals, inds) each (Q, k).

    The compiled replacement for the reference's per-query loop. Methods:

    - ``method='exact'`` (default): on TPU, large galleries route through
      the fused Pallas streaming kernel (:func:`fused_cosine_topk_pallas`)
      — normalize + MXU matmul + exact top-k in VMEM, (Q, G) scores never
      materialized — with a lax.cond dense fallback when the per-row
      exactness certificate fails. Other backends / small galleries use
      the dense blocked path (queries stream in ``query_block`` chunks,
      two-stage top-k). The top-k is exact *for the computed scores*;
      what precision the scores are computed at is set by ``precision``
      (below) — reference torch-f32 score parity needs
      ``precision='highest'`` on TPU.
    - ``method='fused'`` forces the fused kernel (``interpret=True`` for
      CPU testing); ``method='dense'`` forces the blocked dense path.
    - ``method='approx'``: ``lax.approx_max_k`` (TPU partial reduce,
      recall ~0.95) for serving-scale galleries.
    - ``use_pallas``: score the dense path via the Pallas normalize+matmul
      scores kernel.
    - ``matmul_dtype='bfloat16'`` runs the score matmul as one bf16 MXU
      pass with f32 accumulation (~3x the f32 matmul rate; f32 matmuls
      decompose into multiple bf16 passes on the MXU). Ranking is exact for
      the bf16-rounded scores; near-tie order vs f32 may differ within the
      input rounding (~1e-2 on unit vectors). Applies to the fused kernel
      and the dense path alike — a recommended serving mode (higher
      fidelity than ``method='approx'`` at comparable speed). Default
      stays f32 for reference parity.
    - ``matmul_dtype='int8'`` per-row symmetrically quantizes the
      normalized embeddings and scores them on the MXU's int8 path with
      int32 accumulation, rescaling by the per-row scale outer product.
      The gallery streams at a QUARTER of the f32 bytes (the fused kernel
      is stream-bound) and holds 4x the items per chip. Top-k is exact
      for the quantized scores; measured ranking quality vs f32 is near-
      perfect on unit-norm embeddings (see PERF.md).
    - ``gallery_norms`` (f32 mode only): the gallery's row L2 norms,
      precomputed at gallery-build time (GalleryIndex serving form) —
      skips the per-call norm recompute, one full extra gallery read
      (~0.8 ms at 100k x 1536; PERF.md round-5 attribution). Must be
      ``linalg.norm(gallery, axis=1)`` of the SAME gallery; rankings are
      bit-identical with or without.
    - ``precision`` (f32 mode only): ``'default'`` scores with JAX's
      default matmul precision — on TPU that is ONE bf16-truncated MXU
      pass per f32 matmul (~3x the true-f32 rate; near-tie rankings can
      differ from true-f32 scores within the bf16 input rounding).
      ``'highest'`` runs XLA's multi-pass f32-faithful algorithm in both
      the fused kernel and the dense path — scores match the reference's
      torch f32 cosine (train/train.py:73, inference/inference.py:223-242)
      to ~1e-7 relative, at a measured throughput cost (PERF.md 'Matmul
      precision'). On CPU both settings are true f32.
    """
    if matmul_dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unknown matmul_dtype {matmul_dtype!r}")
    _check_prepared(gallery, matmul_dtype, gallery_scale)
    _check_precision(precision, matmul_dtype)
    if use_pallas and gallery.dtype != jnp.float32:
        raise ValueError("use_pallas scores need a raw f32 gallery")
    if use_pallas and matmul_dtype != "float32":
        # the pallas_cosine_scores path always scores in f32; silently
        # returning f32 rankings labeled bf16/int8 would corrupt any
        # serving-mode comparison made through this flag
        raise ValueError("use_pallas scores are f32-only; drop use_pallas "
                         f"or matmul_dtype={matmul_dtype!r}")
    q, d = queries.shape
    g = gallery.shape[0]
    k = min(k, g)
    q_hat = l2_normalize(queries)

    fused = method == "fused" or (
        method == "exact"
        and (jax.default_backend() == "tpu" or interpret)
        and not use_pallas
        and matmul_dtype in ("float32", "bfloat16", "int8")
        and _fused_eligible(q, g, d, k, FUSED_G_TILE, FUSED_T_DEPTH))

    def dense_rank(q_hat):
        if use_pallas:
            g_for_scores = gallery.astype(jnp.float32)
        elif (matmul_dtype == "float32" and gallery_norms is not None
              and gallery.dtype != jnp.bfloat16):
            # serving form: reuse the build-time norms instead of a full
            # extra gallery pass (same clamped-eps arithmetic)
            g_prep = gallery.astype(jnp.float32) / jnp.maximum(
                gallery_norms.reshape(-1, 1), COSINE_SIM_EPS)
            gs_prep = None
        else:
            # prepare once, outside the query-block loop
            g_prep, gs_prep = _prepare_gallery(gallery, matmul_dtype,
                                               gallery_scale)

        qb = min(query_block, _round_up(q, 8))
        qp = _round_up(q, qb)
        q_pad = jnp.pad(q_hat, ((0, qp - q), (0, 0)))
        blocks = q_pad.reshape(qp // qb, qb, d)

        def scores(qblk):
            if use_pallas:
                return pallas_cosine_scores(qblk, g_for_scores,
                                            precision=precision,
                                            interpret=interpret)
            return _scores_prepared(qblk, g_prep, gs_prep, matmul_dtype,
                                    precision)

        def rank_block(qblk):
            sims = scores(qblk)
            if method == "approx":
                return jax.lax.approx_max_k(sims, k,
                                            recall_target=recall_target)
            return chunked_topk(sims, k)

        vals, inds = jax.lax.map(rank_block, blocks)
        return vals.reshape(qp, k)[:q], inds.reshape(qp, k)[:q]

    if not fused:
        return dense_rank(q_hat)

    vals, inds, ok = fused_cosine_topk_pallas(q_hat, gallery, k,
                                              matmul_dtype=matmul_dtype,
                                              gallery_scale=gallery_scale,
                                              gallery_norms=gallery_norms,
                                              precision=precision,
                                              interpret=interpret)

    return certified_topk_repair(q_hat, gallery, k, vals, inds, ok,
                                 matmul_dtype=matmul_dtype,
                                 gallery_scale=gallery_scale,
                                 precision=precision,
                                 full_fallback=lambda: dense_rank(q_hat))


def pack_codes_int32(codes) -> jax.Array:
    """Pack an (G, D) int8 code matrix into (G, D/4) int32 lanes — the
    serving-resident form of the ``int8_rerank`` RESIDUAL codes.

    TPU row-gather cost scales with gathered ELEMENT count, not bytes
    (measured on chip, tools/gather_bench.py at 1M x 1536, 524k rows:
    direct int8 gather 15.4 ms vs 8.3 ms for the same bytes as packed
    int32 lanes). Same byte layout as the int8 matrix — on host this is
    a free numpy view; as a traced op it is one bitcast. D must be a
    multiple of 4 (all supported embedding widths are)."""
    import numpy as np

    g, d = codes.shape
    if d % 4:
        raise ValueError(f"D={d} not a multiple of 4")
    if isinstance(codes, np.ndarray):
        return np.ascontiguousarray(codes).view(np.int32)
    return jax.lax.bitcast_convert_type(
        codes.reshape(g, d // 4, 4), jnp.int32)


def _unpack_codes_int32(rows: jax.Array) -> jax.Array:
    """(…, D/4) int32 packed rows -> (…, D) int8 (bit-exact round trip
    of :func:`pack_codes_int32`)."""
    out = jax.lax.bitcast_convert_type(rows, jnp.int8)  # (…, D/4, 4)
    return out.reshape(*rows.shape[:-1], rows.shape[-1] * 4)


@functools.partial(jax.jit,
                   static_argnames=("k", "shortlist", "rerank_block",
                                    "interpret"))
def int8_rerank_topk(queries: jax.Array, codes: jax.Array,
                     scales: jax.Array, res_codes: jax.Array,
                     res_scales: jax.Array, k: int,
                     *, shortlist: int = 256, rerank_block: int = 128,
                     gallery_norm_bound: jax.Array | None = None,
                     residual_norm_bound: jax.Array | None = None,
                     interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Certified two-stage int8 serving: quantized shortlist → refined
    re-rank. Returns ``(vals, inds, margin)`` each (Q, k)/(Q, k)/(Q,).

    Pure int8 serving holds 4x the items per chip but its top-1 agreement
    vs f32 exact is ~0.965 at 1M items (PERF.md) — outside the north-star
    quality band if int8 is the capacity mode. This mode recovers
    ~f32-exact ranking at int8 streaming speed:

    1. **Stage 1 — certified quantized shortlist**: exact top-``shortlist``
       of the int8 MXU scores via the fused streaming kernel, per-row
       exactness certificate + bounded dense repair (the same machinery as
       ``cosine_topk(matmul_dtype='int8')``). Streams ONLY the primary
       codes: G x D bytes, identical to pure int8 serving.
    2. **Stage 2 — two-level refined re-rank**: gathers the shortlist's
       primary + residual codes (:func:`quantize_rows_int8_residual`;
       reconstruction error ~254x below single-level int8, i.e. far below
       bf16 rounding) and re-scores them against the UNQUANTIZED f32
       queries at ``Precision.HIGHEST`` — removing both the query- and
       gallery-side quantization noise. Exact top-k of the refined scores
       (ties keep stage-1 quantized-rank order — lowest global index
       within equal quantized scores).

    ``res_codes`` may be the plain (G, D) int8 residual matrix or its
    packed (G, D/4) int32 form (:func:`pack_codes_int32` — same bytes,
    4x fewer gathered elements; the serving layer stores it packed).

    ``margin[q] = refined k-th value − quantized shortlist-th value``: the
    score cushion an outside-shortlist item would need to overcome. With
    the quantize-time norm bounds supplied, ``margin[q] > B_q`` (where
    ``B_q = ||q − q̂|| · max_g||ĝ|| + ||q|| · max_g||res_g||``, Cauchy-
    Schwarz) PROVES the result equals the full-gallery refined top-k for
    that query. The bound is worst-case: on 1M random unit embeddings the
    rank-c..k score gap sits below it, so ~0% of rows certify there while
    MEASURED exactness is 1.0000 top-1 / 0.99992 top-150 overlap (PERF.md
    'int8→refined re-rank'); wider-margin galleries do certify. Memory: 2 G·D bytes resident (primary + residual) — half
    of f32, equal to bf16, with stage 1 streaming half of bf16's bytes.

    Reference semantics anchor: training_analysis.ipynb cell 2
    ``topk(cos, k=150)`` — this mode's refined scores match the torch f32
    cosine to ~1e-5 (measured, PERF.md) where pure int8 matches to ~1e-3.
    """
    q, d = queries.shape
    g = codes.shape[0]
    k = min(k, g)
    c = min(max(shortlist, k), g)
    q_hat = l2_normalize(queries)

    def dense_stage1():
        # blocked like cosine_topk's dense path: both lax.cond branches
        # are COMPILED (and their HBM reserved) even when never executed —
        # an unblocked (Q, G) score + sort here reserves ~23 GB at G=1M
        # and fails the whole program at compile time
        qb = min(512, _round_up(q, 8))
        qp1 = _round_up(q, qb)
        q_blk = jnp.pad(q_hat, ((0, qp1 - q), (0, 0))).reshape(
            qp1 // qb, qb, d)
        v, i = jax.lax.map(
            lambda qblk: chunked_topk(
                dense_scores(qblk, codes, "int8", scales), c), q_blk)
        return (v.reshape(qp1, -1)[:q], i.reshape(qp1, -1)[:q])

    # bin-buffer depth scaled to the shortlist: at the default t=6 a
    # k=256 request fails the exactness certificate on ~0.5% of rows
    # (Binom(256, 1/512) > 6, union over 512 bins), which made the
    # bounded repair re-stream the full gallery on EVERY call (+40 ms at
    # 1M, measured). t=8 puts the k=256 union bound at ~3e-7/row and
    # t=10 covers k=512 (~5e-5/row), so the repair cond stays on its
    # free branch. Two extra compare/swap depths cost ~1 ms/call.
    t_depth = (FUSED_T_DEPTH + (2 if c > 150 else 0)
               + (2 if c > 384 else 0))
    if ((jax.default_backend() == "tpu" or interpret)
            and _fused_eligible(q, g, d, c, FUSED_G_TILE, t_depth)):
        v1, i1, ok = fused_cosine_topk_pallas(
            q_hat, codes, c, matmul_dtype="int8", gallery_scale=scales,
            t_depth=t_depth, interpret=interpret)
        v1, i1 = certified_topk_repair(
            q_hat, codes, c, v1, i1, ok, matmul_dtype="int8",
            gallery_scale=scales,
            full_fallback=lambda: dense_stage1())
    else:
        v1, i1 = dense_stage1()
    c = v1.shape[1]                       # chunked_topk may clamp to g

    # stage 2: blocked gather + refined re-rank (the (Q, c, D) gather is
    # the dominant cost — rerank_block bounds its HBM residency)
    qb = min(rerank_block, _round_up(q, 8))
    qp = _round_up(q, qb)
    q_pad = jnp.pad(q_hat, ((0, qp - q), (0, 0)))
    i_pad = jnp.pad(i1, ((0, qp - q), (0, 0)))    # pad rows re-rank row 0

    def rerank(args):
        qblk, iblk = args                          # (B, D), (B, c)
        # primary rows gather directly from the int8 stage-1 array (no
        # second resident copy); residual rows gather as packed int32
        # lanes when the serving layer stored them packed (4x fewer
        # gathered elements — tools/gather_bench.py)
        c1 = codes[iblk].astype(jnp.float32)       # (B, c, D)
        if res_codes.dtype == jnp.int32:
            c2 = _unpack_codes_int32(res_codes[iblk]).astype(jnp.float32)
        else:
            c2 = res_codes[iblk].astype(jnp.float32)
        s1 = scales[iblk][..., 0]                  # (B, c)
        s2 = res_scales[iblk][..., 0]
        # HIGHEST: the default one-pass bf16 truncation of the f32 query
        # operand would reintroduce ~bf16-level score noise — the exact
        # error this stage exists to remove (codes ≤ 127 are exact in
        # bf16; the query side is not)
        dots1 = jnp.einsum("bd,bcd->bc", qblk, c1,
                           precision=jax.lax.Precision.HIGHEST)
        dots2 = jnp.einsum("bd,bcd->bc", qblk, c2,
                           precision=jax.lax.Precision.HIGHEST)
        refined = dots1 * s1 + dots2 * s2
        rv, rp = jax.lax.top_k(refined, k)
        return rv, jnp.take_along_axis(iblk, rp, axis=1)

    vals, inds = jax.lax.map(rerank, (q_pad.reshape(qp // qb, qb, d),
                                      i_pad.reshape(qp // qb, qb, c)))
    vals = vals.reshape(qp, k)[:q]
    inds = inds.reshape(qp, k)[:q]
    margin = vals[:, k - 1] - v1[:, c - 1]
    if gallery_norm_bound is not None and residual_norm_bound is not None:
        qq, qs = quantize_rows_int8(q_hat)
        q_err = jnp.linalg.norm(q_hat - qq.astype(jnp.float32) * qs,
                                axis=1)
        q_norm = jnp.linalg.norm(q_hat, axis=1)
        bound = q_err * gallery_norm_bound + q_norm * residual_norm_bound
        # margin becomes a signed certificate: > 0 iff provably exact
        margin = margin - bound
    return vals, inds, margin


def cosine_scores(queries: jax.Array, gallery: jax.Array,
                  *, use_pallas: bool = False,
                  precision: str = "default",
                  interpret: bool = False) -> jax.Array:
    """Full (Q, G) cosine matrix (for small galleries / in-batch metrics).

    ``precision='highest'`` computes f32-faithful scores on TPU (see
    :func:`_dot_precision`); the default is the MXU's one-pass
    bf16-truncated f32 matmul."""
    q_hat = l2_normalize(queries)
    if use_pallas:
        return pallas_cosine_scores(q_hat, gallery.astype(jnp.float32),
                                    precision=precision,
                                    interpret=interpret)
    return jax.lax.dot_general(
        q_hat, l2_normalize(gallery),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=_dot_precision(precision),
        preferred_element_type=jnp.float32)
