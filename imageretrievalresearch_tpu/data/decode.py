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
