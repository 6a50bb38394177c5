"""Decoded-image RAM cache (opt-in: ``DATASET.CACHE_IMAGES``).

JPEG decode is the dominant host cost once augmentation geometry runs
through the native fused sampler (profiled: cv2.imread = 67% of the
per-item time on the synthetic-VOC loader). The reference re-decodes
from disk every epoch (lib/datasets/voc0712.py:113); with ~0.5 MB per
decoded 300-500 px image even full VOC07+12 trainval (~16k images)
fits in ~8 GB of host RAM, so epochs >= 1 can skip the decoder
entirely. Returned arrays are copies — a consumer mutating its batch
can never poison the cache.

Bounded by ``DATASET.CACHE_GB``: once the budget is reached the cache
stops inserting (no eviction — detection epochs touch every image, so
LRU would thrash; a partial cache still serves its hits).
"""

from __future__ import annotations

import threading

import cv2


class ImageCache:
    def __init__(self, max_gb: float = 8.0):
        self.max_bytes = int(max_gb * (1 << 30))
        self._store = {}
        self._bytes = 0
        self._full = False
        self._lock = threading.Lock()

    def stats(self):
        return {"images": len(self._store), "bytes": self._bytes,
                "full": self._full}

    def imread(self, path):
        """cv2.imread(path) with cache; returns a fresh writable copy
        (or None, uncached, exactly like cv2.imread on failure)."""
        img = self._store.get(path)
        if img is not None:
            return img.copy()
        img = cv2.imread(path)
        if img is None or self._full:
            return img
        with self._lock:
            if path not in self._store:
                if self._bytes + img.nbytes > self.max_bytes:
                    self._full = True
                    return img
                # store a private copy: the caller owns (and may
                # mutate) the array we return
                self._store[path] = img.copy()
                self._bytes += img.nbytes
        return img
