"""Decoded-image RAM cache (opt-in: ``DATASET.CACHE_IMAGES``).

JPEG decode is the dominant host cost once augmentation geometry runs
through the native fused sampler (profiled: cv2.imread = 67% of the
per-item time on the synthetic-VOC loader). The reference re-decodes
from disk every epoch (lib/datasets/voc0712.py:113); with ~0.5 MB per
decoded 300-500 px image even full VOC07+12 trainval (~16k images)
fits in ~8 GB of host RAM, so epochs >= 1 can skip the decoder
entirely. Returned arrays are copies — a consumer mutating its batch
can never poison the cache.

Bounded by ``DATASET.CACHE_GB``: an image that does not fit in the
remaining budget is simply not stored (no eviction — detection epochs
touch every image, so LRU would thrash; a partial cache still serves
its hits — and no terminal "full" latch, so one oversized image can't
stop smaller later images from caching).

One cache is shared per dataset root (``shared_cache``): train and
eval loaders of the same run draw on one budget and de-duplicate
overlapping splits instead of holding two full-budget stores.
"""

from __future__ import annotations

import os.path as osp
import threading

import cv2


class ImageCache:
    def __init__(self, max_gb: float = 8.0):
        self.max_bytes = int(max_gb * (1 << 30))
        self._store = {}
        self._bytes = 0
        self._refused = 0  # inserts skipped for budget (observability)
        self._lock = threading.Lock()

    def stats(self):
        return {"images": len(self._store), "bytes": self._bytes,
                "refused": self._refused}

    def imread(self, path):
        """cv2.imread(path) with cache; returns a fresh writable copy
        (or None, uncached, exactly like cv2.imread on failure)."""
        img = self._store.get(path)
        if img is not None:
            return img.copy()
        img = cv2.imread(path)
        if img is None:
            return img
        with self._lock:
            if path not in self._store:
                if self._bytes + img.nbytes > self.max_bytes:
                    self._refused += 1
                    return img
                # store a private copy: the caller owns (and may
                # mutate) the array we return
                self._store[path] = img.copy()
                self._bytes += img.nbytes
        return img


_shared = {}
_shared_lock = threading.Lock()


def shared_cache(dataset_dir, max_gb: float = 8.0) -> ImageCache:
    """Process-wide cache per dataset root. The budget is set by the
    first caller for that root; later callers share the instance (and
    therefore the one budget) regardless of their max_gb."""
    key = osp.abspath(dataset_dir)
    with _shared_lock:
        cache = _shared.get(key)
        if cache is None:
            _shared[key] = cache = ImageCache(max_gb)
        return cache
