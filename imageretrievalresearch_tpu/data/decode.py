"""Shared decode + RAM-cache machinery for the *ImageDataset classes.

The reference caches decoded PIL images per dataset when ``cache=True``
(data/sketch_dataset.py:268-270); here the cache stores uint8 HWC numpy
arrays and can optionally store them pre-resized (``cache_size``) so the
per-sample hot path is a pure dict hit — on a decode-bound host this turns
steady-state training epochs device-bound (PERF.md round-2 training notes).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


class DecodeCacheMixin:
    """Mixin for datasets exposing ``image_lst``/``sketch_lst`` path lists.

    Call :meth:`_init_decode_cache` from ``__init__``; use :meth:`_decode`
    in ``__getitem__``.
    """

    def _init_decode_cache(self, load_images: bool,
                           cache_size: int | None,
                           cache_store: dict | None = None) -> None:
        """``cache_store``: an externally shared path->array dict. Pass the
        SAME dict to sibling datasets over the same tree (e.g. the train
        CLI's train/val TripleDataset pair, whose sketch universe is the
        whole tree regardless of split) so each image is decoded and held
        in RAM once per process instead of once per instance. Only share
        between datasets with the same ``cache_size``."""
        self.load_images = load_images
        self.cache_size = cache_size
        self._cache: dict[str, np.ndarray] = (
            cache_store if cache_store is not None else {})
        if load_images:
            for p in set(self.sketch_lst) | set(self.image_lst):
                if p not in self._cache:
                    self._cache[p] = self._decode(p)

    def _decode(self, path: str) -> np.ndarray:
        if path in self._cache:
            return self._cache[path]
        with Image.open(path) as im:
            if (self.cache_size is not None
                    and im.size != (self.cache_size, self.cache_size)):
                im = im.convert("RGB").resize(
                    (self.cache_size, self.cache_size), Image.BILINEAR)
            return np.asarray(im.convert("RGB"))


class TripletImageMixin(DecodeCacheMixin):
    """Image-level wrapper over a path-level triplet dataset.

    The reference repeats this ~25-line wrapper in all three dataset
    families (sketch_dataset.py:245-309, original_dataset.py:294-380,
    softdataset.py:159-200); one shared implementation means fixes (like
    the construction-time random=True guard) apply to every family at
    once. Decodes sampled triplets, optionally applies a per-image
    ``transform_dic``, and seeds a default rng (the loader passes a
    deterministic per-(epoch, idx) one instead)."""

    def __init__(self, transform_dic: dict | None = None,
                 pos_return_num: int = 1, neg_return_num: int = 1,
                 load_images: bool = False, cache_size: int | None = None,
                 seed: int = 0, **kwargs):
        if not kwargs.get("random", True):
            # fail at construction: the materialized-json (random=False)
            # image mode is path-level only, and the eager decode cache
            # below would otherwise spend minutes before __getitem__'s
            # index check fired
            raise ValueError(
                f"{type(self).__name__} requires random=True indexing; the "
                "materialized data_json mode is path-level only")
        super().__init__(**kwargs)
        self.transform_dic = transform_dic
        self.pos_return_num = pos_return_num
        self.neg_return_num = neg_return_num
        self._rng = np.random.default_rng(seed)
        self._init_decode_cache(load_images, cache_size)
        if transform_dic:
            self.qry_trans = transform_dic["qry"]
            self.pos_trans = transform_dic["pos"]
            self.neg_trans = transform_dic["neg"]

    def __getitem__(self, idx: int,
                    rng: np.random.Generator | None = None) -> dict:
        assert self.index is not None
        rng = rng or self._rng
        s = self.index.sample(idx, rng, self.pos_return_num,
                              self.neg_return_num)
        qry = self._decode(s["qry"])
        pos = [self._decode(p) for p in s["pos"]]
        neg = [self._decode(p) for p in s["neg"]]
        if self.transform_dic:
            qry = self.qry_trans(qry)
            pos = [self.pos_trans(i) for i in pos]
            neg = [self.neg_trans(i) for i in neg]
        return {"qry": qry, "pos": pos, "neg": neg,
                "cat_idx": s["cat_idx"], "prod_idx": s["prod_idx"],
                "paths": {"qry": s["qry"], "pos": s["pos"], "neg": s["neg"]}}
