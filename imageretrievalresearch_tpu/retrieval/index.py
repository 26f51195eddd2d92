"""GalleryIndex — persistent, serving-grade embedding gallery.

The reference recomputes the gallery ad hoc inside each evaluation run
(inference/training_analysis.ipynb cell 2 re-embeds the full test split,
then loops queries in Python). For production serving that is the wrong
shape: the gallery is a long-lived artifact — built once (or incrementally
as the catalog grows), saved to disk, loaded into device HBM, and queried
at high rate. This module provides that artifact:

- build incrementally (``add``) from embeddings + class labels (+ optional
  item paths for result presentation);
- ``save`` / ``load`` as a single ``.npz`` (portable, no framework state);
- device-resident queries through :func:`ops.retrieval.cosine_topk` — the
  fused Pallas streaming kernel (exact) or ``lax.approx_max_k`` (serving) —
  or sharded over a ``jax.sharding.Mesh`` for galleries beyond one chip
  (``parallel.gallery.sharded_cosine_topk``);
- embeddings are L2-normalized at ingest, so queries skip the gallery-norm
  pass and saved bytes are directly dot-product-ready (cosine semantics
  preserved: normalize is idempotent, torch CosineSimilarity eps clamp
  applied once at ingest).

Ranking semantics match the reference's ``topk(cos(fm, gallery), k)``
(training_analysis.ipynb cell 2); ``query_class_dedup`` applies the
notebook's unique-class dedup on top.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from imageretrievalresearch_tpu import metrics as M
from imageretrievalresearch_tpu.ops.retrieval import (
    cosine_topk,
    int8_rerank_topk,
    l2_normalize,
    pack_codes_int32,
)

_FORMAT_VERSION = 1          # raw f32 embeddings
_FORMAT_VERSION_COMPACT = 2  # bf16 bit-view / int8+scales storage


@functools.partial(jax.jit, static_argnames=("k",))
def _drop_pad_rows(vals, inds, n_real, k):
    """Re-rank a top-(k+pad) result after masking pad rows to -inf, in ONE
    device program: eager where/argsort/take would cost 4 dispatch round
    trips (~28 ms each over the remote transport) per sharded query.
    ``n_real`` is traced (recompiles only on new (Q, kk) shapes or k, not
    on gallery growth)."""
    vals = jnp.where(inds < n_real, vals, -jnp.inf)
    order = jnp.argsort(-vals, axis=1, stable=True)[:, :k]
    return (jnp.take_along_axis(vals, order, axis=1),
            jnp.take_along_axis(inds, order, axis=1))


def _np_quantize_rows_int8(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side twin of ops.retrieval.quantize_rows_int8 (same f32
    arithmetic, numpy's round is also half-to-even) — avoids shipping the
    full f32 gallery over a slow host->device link just to quantize."""
    x = np.asarray(x, np.float32)
    scale = np.maximum(np.abs(x).max(axis=1, keepdims=True),
                       np.float32(1e-12)) / np.float32(127.0)
    codes = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


def _np_quantize_rows_int8_residual(x: np.ndarray):
    """Host-side twin of ops.retrieval.quantize_rows_int8_residual (same
    f32 arithmetic) for the ``int8_rerank`` serving mode: primary + int8
    residual codes plus the two norm bounds its recall certificate uses."""
    x = np.asarray(x, np.float32)
    c1, s1 = _np_quantize_rows_int8(x)
    deq1 = c1.astype(np.float32) * s1
    resid = (x - deq1).astype(np.float32)
    c2, s2 = _np_quantize_rows_int8(resid)
    g1max = np.float32(np.linalg.norm(deq1, axis=1).max())
    rmax = np.float32(np.linalg.norm(resid, axis=1).max())
    return c1, s1, c2, s2, g1max, rmax


class GalleryIndex:
    """An append-only gallery of L2-normalized embeddings with labels.

    Host state is numpy (cheap appends); the device copy is materialized
    lazily on first query and invalidated by ``add``.
    """

    def __init__(self, dim: int, *, meta: dict | None = None):
        self.dim = int(dim)
        self._embeds: list[np.ndarray] = []
        self._classes: list[np.ndarray] = []
        self._paths: list[str] = []
        self.meta = dict(meta or {})
        # per-matmul_dtype prepared device gallery: {"float32": arr,
        # "bfloat16": arr, "int8": (codes, scales)} — only the requested
        # form is resident, so int8 serving really holds 4x items/chip
        self._device_gallery: dict = {}
        self._device_classes: jax.Array | None = None

    # --- construction ---

    def add(self, embeddings, classes, paths: list[str] | None = None
            ) -> "GalleryIndex":
        """Append (N, dim) embeddings with (N,) integer class labels."""
        e = np.asarray(embeddings, dtype=np.float32)
        if e.ndim != 2 or e.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) embeddings, "
                             f"got {e.shape}")
        c = np.asarray(classes, dtype=np.int32).reshape(-1)
        if c.shape[0] != e.shape[0]:
            raise ValueError(f"{e.shape[0]} embeddings but {c.shape[0]} "
                             "class labels")
        if paths is not None and len(paths) != e.shape[0]:
            raise ValueError(f"{e.shape[0]} embeddings but {len(paths)} "
                             "paths")
        # normalize on the host CPU backend: the default device here may be
        # a REMOTE accelerator (this sandbox's ~60 MB/s tunnel), and add()
        # is host bookkeeping — round-tripping every embedding through the
        # device link costs ~20 s per 100k x 1536 gallery for zero benefit.
        # Using the XLA:CPU l2_normalize (not a numpy twin) keeps the
        # stored values bitwise-identical to the test suite's CPU reference.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                normed = np.asarray(l2_normalize(e))
        else:
            normed = np.asarray(l2_normalize(e))
        self._embeds.append(normed)
        self._classes.append(c)
        self._paths.extend(paths if paths is not None
                           else [""] * e.shape[0])
        self._device_gallery = {}
        self._device_classes = None
        return self

    def __len__(self) -> int:
        return sum(e.shape[0] for e in self._embeds)

    @property
    def embeddings(self) -> np.ndarray:
        """(G, dim) normalized embeddings (host copy)."""
        if not self._embeds:
            return np.zeros((0, self.dim), np.float32)
        if len(self._embeds) > 1:
            self._embeds = [np.concatenate(self._embeds)]
        return self._embeds[0]

    @property
    def classes(self) -> np.ndarray:
        if not self._classes:
            return np.zeros((0,), np.int32)
        if len(self._classes) > 1:
            self._classes = [np.concatenate(self._classes)]
        return self._classes[0]

    @property
    def paths(self) -> list[str]:
        return self._paths

    # --- persistence ---

    def save(self, path: str | Path, *,
             store_dtype: str = "float32") -> None:
        """One portable .npz: embeddings, classes, paths, json meta.

        ``store_dtype`` shrinks the artifact: ``'bfloat16'`` (half size,
        stored as a uint16 bit view) or ``'int8'`` (quarter size, per-row
        symmetric quantization + f32 scales — pairs with the
        ``matmul_dtype='int8'`` query mode). Loads reconstruct f32; the
        bf16/int8 rounding matches the corresponding query arithmetic.
        """
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        emb = self.embeddings
        extra = {}
        if store_dtype == "bfloat16":
            import ml_dtypes
            emb = emb.astype(ml_dtypes.bfloat16).view(np.uint16)
        elif store_dtype == "int8":
            emb, extra["scales"] = _np_quantize_rows_int8(emb)
        elif store_dtype != "float32":
            raise ValueError(f"unknown store_dtype {store_dtype!r}")
        # compact artifacts write version 2 so pre-round-3 loaders (which
        # only know version 1 = raw f32 embeddings) reject them loudly
        # instead of reinterpreting bit views / int8 codes as f32
        version = (_FORMAT_VERSION if store_dtype == "float32"
                   else _FORMAT_VERSION_COMPACT)
        np.savez_compressed(
            path,
            embeddings=emb,
            classes=self.classes,
            # fixed-width unicode, NOT dtype=object: object arrays pickle,
            # and a pickled payload in an untrusted artifact is arbitrary
            # code execution at load (the serve/query CLIs load whatever
            # path they're given) — this keeps load allow_pickle=False
            paths=np.asarray(self._paths, dtype=np.str_),
            # user meta spreads FIRST: the structural fields load() depends
            # on (version/dim/store_dtype) must win over same-named user
            # keys, or a meta={'store_dtype': ...} entry corrupts the load
            meta=np.frombuffer(json.dumps(
                {**self.meta, "version": version, "dim": self.dim,
                 "store_dtype": store_dtype}).encode(),
                dtype=np.uint8),
            **extra,
        )

    @classmethod
    def load(cls, path: str | Path) -> "GalleryIndex":
        try:
            with np.load(path, allow_pickle=False) as z:
                meta = json.loads(bytes(z["meta"].tobytes()).decode())
                if meta.pop("version") not in (_FORMAT_VERSION,
                                               _FORMAT_VERSION_COMPACT):
                    raise ValueError(
                        f"unsupported gallery format in {path}")
                store_dtype = meta.pop("store_dtype", "float32")
                idx = cls(meta.pop("dim"), meta=meta)
                e = z["embeddings"]
                if store_dtype == "bfloat16":
                    import ml_dtypes
                    e = e.view(ml_dtypes.bfloat16).astype(np.float32)
                elif store_dtype == "int8":
                    e = e.astype(np.float32) * z["scales"]
                else:
                    e = e.astype(np.float32)
                if e.shape[0]:
                    idx._embeds = [e]
                    idx._classes = [z["classes"].astype(np.int32)]
                    # npz member reads are lazy: a pre-hardening artifact
                    # whose paths were pickled (dtype=object) raises HERE,
                    # not at np.load — hence the wrapper around the body
                    idx._paths = [str(p) for p in z["paths"]]
        except ValueError as err:
            if ("allow_pickle" in str(err)
                    or "Object arrays" in str(err)):
                raise ValueError(
                    f"{path} was saved by an older version that pickled "
                    "its path metadata; this loader refuses pickled "
                    "payloads (arbitrary code execution risk). Rebuild "
                    "the artifact with `gallery build` / save()."
                ) from err
            raise
        return idx

    # --- querying ---

    def _gallery_on_device(self, matmul_dtype: str = "float32", mesh=None):
        """The device-resident gallery in the serving form the query
        arithmetic consumes — prepared ONCE per (dtype, mesh) on host
        (numpy) and uploaded in its compact form (int8: quarter, bf16:
        half the f32 bytes over the host->device link), then cached.
        Embeddings are already L2-normalized at ingest.

        With ``mesh``, rows are zero-padded on host to a mesh multiple and
        each device receives ONLY its compact row shard
        (:func:`parallel.mesh.put_row_sharded`) — full f32 is never
        materialized on any device, so a sharded int8 gallery really holds
        ``G/n_dev`` quarter-size rows per chip. Returns ``(codes, scales)``
        for int8, a single array otherwise.
        """
        key = (matmul_dtype,
               None if mesh is None
               else (mesh.axis_names,
                     tuple(d.id for d in mesh.devices.flat)))
        if key not in self._device_gallery:
            emb = self.embeddings
            pad = 0
            if mesh is not None:
                from imageretrievalresearch_tpu.parallel.mesh import (
                    put_row_sharded,
                )
                pad = (-emb.shape[0]) % mesh.shape["data"]
                put = lambda a: put_row_sharded(a, mesh)  # noqa: E731
            else:
                put = jnp.asarray
            if matmul_dtype == "int8_rerank":
                if mesh is not None:
                    raise ValueError(
                        "matmul_dtype='int8_rerank' does not support mesh "
                        "sharding yet; use 'int8' for sharded capacity or "
                        "query unsharded")
                c1, s1, c2, s2, g1m, rm = _np_quantize_rows_int8_residual(
                    emb)
                # residual codes resident in packed-int32 form: same
                # bytes, 4x fewer elements per stage-2 row gather
                self._device_gallery[key] = (
                    put(c1), put(s1), put(pack_codes_int32(c2)), put(s2),
                    jnp.asarray(g1m), jnp.asarray(rm))
            elif matmul_dtype == "int8":
                codes, scales = _np_quantize_rows_int8(emb)
                if pad:
                    codes = np.pad(codes, ((0, pad), (0, 0)))
                    # pad scales with 1.0: 0-code rows score exactly 0.0
                    # either way and an all-zero scale row would be the
                    # only path producing 0 * 0 ambiguity downstream
                    scales = np.pad(scales, ((0, pad), (0, 0)),
                                    constant_values=1.0)
                self._device_gallery[key] = (put(codes), put(scales))
            elif matmul_dtype == "bfloat16":
                import ml_dtypes
                g = emb.astype(ml_dtypes.bfloat16)
                if pad:
                    g = np.pad(g, ((0, pad), (0, 0)))
                self._device_gallery[key] = put(g)
            elif mesh is None:
                # f32 serving form: norms precomputed at build time — the
                # per-call recompute inside cosine_topk costs one extra
                # full gallery read (round-5 kernel attribution, PERF.md)
                norms = np.linalg.norm(emb, axis=1).astype(np.float32)
                self._device_gallery[key] = (put(emb), jnp.asarray(norms))
            else:
                g = np.pad(emb, ((0, pad), (0, 0))) if pad else emb
                # pad norms with 1.0: zero pad rows score exactly 0.0
                norms = np.pad(
                    np.linalg.norm(emb, axis=1).astype(np.float32),
                    (0, pad), constant_values=1.0).reshape(-1, 1)
                self._device_gallery[key] = (put(g), put(norms))
        return self._device_gallery[key]

    def _classes_on_device(self) -> jax.Array:
        # cached like the gallery: re-uploading (G,) classes per call costs
        # real latency per serve request over a slow host->device link
        if self._device_classes is None:
            self._device_classes = jnp.asarray(self.classes)
        return self._device_classes

    def query(self, queries, k: int = 150, *, method: str = "exact",
              matmul_dtype: str = "float32", mesh=None,
              precision: str = "default", shortlist: int = 256,
              interpret: bool = False
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Rank the gallery for (Q, dim) query embeddings.

        Returns ``(vals, inds, classes)`` each (Q, k). ``method`` follows
        :func:`cosine_topk` ('exact' routes through the fused Pallas kernel
        on TPU, 'approx' is the recall~0.95 serving path);
        ``matmul_dtype='bfloat16'``/``'int8'`` are the serving modes (exact
        top-k of bf16-rounded / int8-quantized MXU scores at half / quarter
        the gallery bytes; ~f32 ranking up to near-ties).
        ``matmul_dtype='int8_rerank'`` is the certified two-stage capacity
        mode: int8 fused top-``shortlist`` then a two-level-dequantized
        f32-faithful re-rank (:func:`ops.retrieval.int8_rerank_topk`) —
        ~f32-exact ranking at int8 streaming speed, bf16 memory.
        ``precision='highest'`` (f32 mode) computes torch-f32-faithful
        scores on TPU instead of the default one-pass bf16-truncated
        matmul — see :func:`cosine_topk`.
        With ``mesh``, the gallery is sharded over the mesh's 'data' axis
        and ranked per-shard with an all-gather merge (exact).
        """
        if not len(self):
            raise ValueError("empty gallery")
        if mesh is not None and method != "exact":
            # sharded_cosine_topk has no approx variant; running exact and
            # calling it 'approx' would silently misreport the latency/
            # recall envelope the caller asked to measure
            raise ValueError(
                f"method={method!r} is not supported with mesh; the sharded"
                " path is exact-only")
        q = jnp.asarray(np.asarray(queries, dtype=np.float32))
        k = min(k, len(self))
        if matmul_dtype == "int8_rerank":
            if mesh is not None:
                raise ValueError("matmul_dtype='int8_rerank' does not "
                                 "support mesh sharding yet")
            if method != "exact":
                raise ValueError("int8_rerank is an exact re-rank mode; "
                                 f"method={method!r} is not supported")
            if precision != "default":
                raise ValueError("int8_rerank already re-ranks at "
                                 "Precision.HIGHEST; the precision knob "
                                 "applies to float32 mode only")
            c1, s1, c2, s2, g1m, rm = self._gallery_on_device(matmul_dtype)
            vals, inds, _ = int8_rerank_topk(
                q, c1, s1, c2, s2, k, shortlist=shortlist,
                gallery_norm_bound=g1m, residual_norm_bound=rm,
                interpret=interpret)
            vals, inds = np.asarray(vals), np.asarray(inds)
            return vals, inds, self.classes[inds]
        if mesh is None:
            # single-device: query against the compact prepared form (only
            # that form is device-resident — the whole point of int8/bf16)
            prepared = self._gallery_on_device(matmul_dtype)
            g_norms = None
            if matmul_dtype == "float32":
                g, g_norms = prepared
                g_scale = None
            else:
                g, g_scale = (prepared if isinstance(prepared, tuple)
                              else (prepared, None))
            vals, inds = cosine_topk(q, g, k, method=method,
                                     matmul_dtype=matmul_dtype,
                                     gallery_scale=g_scale,
                                     gallery_norms=g_norms,
                                     precision=precision,
                                     interpret=interpret)
            vals, inds = np.asarray(vals), np.asarray(inds)
            return vals, inds, self.classes[inds]
        # mesh path: each device holds ONLY its compact row shard (int8
        # codes+scales / bf16 / f32), padded on host to a mesh multiple —
        # full f32 never touches any single device
        from imageretrievalresearch_tpu.parallel.gallery import (
            sharded_cosine_topk,
        )
        prepared = self._gallery_on_device(matmul_dtype, mesh=mesh)
        g_scale = g_norms = None
        if matmul_dtype == "float32":
            g, g_norms = prepared
        elif isinstance(prepared, tuple):
            g, g_scale = prepared
        else:
            g = prepared
        pad = g.shape[0] - len(self)
        # zero pad rows score exactly 0, which can outrank real rows with
        # negative similarity — over-query by the pad count, then drop pad
        # indices: the global top-(k+pad) contains at least k real rows
        kk = min(k + pad, g.shape[0])
        vals, inds = sharded_cosine_topk(q, g, kk, mesh,
                                         matmul_dtype=matmul_dtype,
                                         gallery_scale=g_scale,
                                         gallery_norms=g_norms,
                                         precision=precision,
                                         interpret=interpret)
        if pad:
            vals, inds = _drop_pad_rows(vals, inds, len(self), k)
        else:
            vals, inds = vals[:, :k], inds[:, :k]
        vals, inds = np.asarray(vals), np.asarray(inds)
        return vals, inds, self.classes[inds]

    def query_class_dedup(self, queries, *, k: int = 150,
                          num_unique: int = 3, **kw
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Notebook-semantics ranking: top-k then first ``num_unique``
        unique classes (training_analysis.ipynb cell 2). Returns
        ``(vals, inds, classes)`` each (Q, num_unique) — the same tuple
        order as :meth:`query`."""
        vals, inds, _ = self.query(queries, k=k, **kw)
        cls_dev = self._classes_on_device()
        dedup = jax.vmap(lambda i, v: M.unique_class_dedup(
            i, v, cls_dev, num_unique=num_unique))(
            jnp.asarray(inds), jnp.asarray(vals))
        uniq_inds, uniq_vals, uniq_cls = map(np.asarray, dedup)
        return uniq_vals, uniq_inds, uniq_cls
