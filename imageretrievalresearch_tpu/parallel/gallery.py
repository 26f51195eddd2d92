"""Distributed gallery retrieval: shard the gallery, all-gather the top-k.

For galleries beyond one chip's HBM (or to cut latency linearly), shard the
gallery rows across the ``data`` axis, rank locally against replicated
queries, then merge each device's local top-k with one small ``all_gather``
over ICI — k×devices candidates per query instead of the full gallery
(SURVEY.md §5 long-context analog: "scaling gallery size").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from imageretrievalresearch_tpu.ops.retrieval import (
    FUSED_G_TILE,
    FUSED_T_DEPTH,
    _check_precision,
    _check_prepared,
    _fused_eligible,
    certified_topk_repair,
    chunked_topk,
    dense_scores,
    fused_cosine_topk_pallas,
    l2_normalize,
)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis_name", "k", "k_local", "shard",
                              "fused", "matmul_dtype", "precision",
                              "interpret"))
def _sharded_topk_impl(queries, gallery, *extra, mesh, axis_name, k, k_local,
                       shard, fused, matmul_dtype, precision, interpret):
    """One compiled program: shard_map ranking + the candidate merge.

    Jitted as a whole because this IS the serving dispatch path — eager
    execution would pay a ~28 ms dispatch RTT for the shard_map call plus
    each of the four merge ops on a remote transport (CLAUDE.md).

    ``*extra`` carries at most ONE row-sharded (G, 1) side array — the
    int8 scales (matmul_dtype='int8') or the f32 build-time gallery norms
    (matmul_dtype='float32'); the modes are disjoint, so one slot covers
    both."""

    def local_rank(q_hat, g_local, ex_local):
        gs_local = ex_local if matmul_dtype == "int8" else None
        gn_local = ex_local if matmul_dtype == "float32" else None
        # g_local: (shard, D) on each device; score arithmetic shared with
        # the single-device paths via ops.retrieval.dense_scores
        if fused:
            vals, inds, ok = fused_cosine_topk_pallas(
                q_hat, g_local, k_local, matmul_dtype=matmul_dtype,
                gallery_scale=gs_local, gallery_norms=gn_local,
                precision=precision,
                interpret=interpret)
            # bounded per-shard certificate repair — the SAME parity-
            # critical logic as the single-device path, shared via
            # ops.retrieval.certified_topk_repair
            vals, inds = certified_topk_repair(
                q_hat, g_local, k_local, vals, inds, ok,
                matmul_dtype=matmul_dtype, gallery_scale=gs_local,
                precision=precision,
                full_fallback=lambda: tuple(chunked_topk(
                    dense_scores(q_hat, g_local, matmul_dtype, gs_local,
                                 precision),
                    k_local)))
        else:
            vals, inds = chunked_topk(
                dense_scores(q_hat, g_local, matmul_dtype, gs_local,
                             precision),
                k_local)
        # localize -> globalize indices by shard offset
        offset = jax.lax.axis_index(axis_name) * shard
        return vals, inds + offset

    extra_spec = (P(axis_name, None),) if extra else ()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis_name, None)) + extra_spec,
        out_specs=(P(axis_name), P(axis_name)),
        # pallas_call outputs don't carry varying-mesh-axis metadata yet
        check_vma=False)
    def ranked(q_hat, g_shard, *ex_shard):
        vals, inds = local_rank(q_hat, g_shard,
                                ex_shard[0] if ex_shard else None)
        return vals[None], inds[None]     # leading device axis for gather

    q_hat = l2_normalize(queries)
    vals, inds = ranked(q_hat, gallery, *extra)   # (n_dev, Q, k_local) each
    # merge: concatenate device candidates, re-top-k (tiny: n_dev*k per query)
    vals = jnp.swapaxes(vals, 0, 1).reshape(queries.shape[0], -1)
    inds = jnp.swapaxes(inds, 0, 1).reshape(queries.shape[0], -1)
    mvals, mpos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    minds = jnp.take_along_axis(inds, mpos, axis=1)
    return mvals, minds


def sharded_cosine_topk(queries: jax.Array, gallery: jax.Array, k: int,
                        mesh: Mesh, *, axis_name: str = "data",
                        use_fused: bool | None = None,
                        matmul_dtype: str = "float32",
                        gallery_scale: jax.Array | None = None,
                        gallery_norms: jax.Array | None = None,
                        precision: str = "default",
                        interpret: bool = False
                        ) -> tuple[jax.Array, jax.Array]:
    """(Q, D) × (G, D) -> global (vals, inds) with the gallery sharded on
    ``axis_name``. Gallery rows must divide the mesh (pad upstream).

    On TPU meshes, each device ranks its shard with the fused Pallas
    streaming kernel (normalize + matmul + exact in-VMEM top-k, certificate
    + bounded per-row dense repair); other backends use the dense blocked
    path. ``use_fused`` overrides the auto choice; ``matmul_dtype``
    selects the bf16/int8 serving arithmetic per shard (see
    :func:`ops.retrieval.cosine_topk`). The gallery may be PRE-PREPARED in
    its compact serving form (bf16 normalized, or int8 codes +
    row-sharded ``gallery_scale`` (G, 1)) so each device only ever holds
    its compact shard — pair with :func:`parallel.mesh.put_row_sharded`.
    """
    # same mode/dtype agreement the single-device path enforces: a
    # prepared (bf16/int8) gallery must not silently score with
    # mismatched arithmetic on the dense route
    _check_prepared(gallery, matmul_dtype, gallery_scale)
    _check_precision(precision, matmul_dtype)
    n_dev = mesh.shape[axis_name]
    g = gallery.shape[0]
    assert g % n_dev == 0, "pad gallery to a multiple of the mesh size"
    shard = g // n_dev
    # k is clamped to the gallery size (not silently to the shard size:
    # local candidates are min(k, shard) per device, which still covers the
    # exact global top-k because each device contributes its full shard
    # ranking prefix — k > shard just means every shard row is a candidate)
    k = min(k, g)
    k_local = min(k, shard)
    q, d = queries.shape
    # route on the MESH devices' platform, not jax.default_backend(): this
    # sandbox's sitecustomize makes the default backend a remote TPU even
    # in processes that build a virtual CPU mesh (and vice versa a CPU
    # default must not suppress the kernel on a real TPU mesh)
    platform = mesh.devices.flat[0].platform
    fused = use_fused if use_fused is not None else (
        (platform == "tpu" or interpret)
        and _fused_eligible(q, shard, d, k_local, FUSED_G_TILE,
                            FUSED_T_DEPTH))
    if gallery_norms is not None and matmul_dtype != "float32":
        raise ValueError("gallery_norms applies to the float32 mode only")
    extra = ()
    if gallery_scale is not None:
        extra = (gallery_scale,)
    elif gallery_norms is not None:
        # build-time norms, row-sharded like the gallery (skips the
        # per-shard per-call norm recompute — PERF.md round-5)
        extra = (gallery_norms.reshape(-1, 1),)
    args = (gallery,) + extra
    return _sharded_topk_impl(queries, *args, mesh=mesh,
                              axis_name=axis_name, k=k, k_local=k_local,
                              shard=shard, fused=fused,
                              matmul_dtype=matmul_dtype, precision=precision,
                              interpret=interpret)
