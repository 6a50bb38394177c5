"""Fused virtual-expand crop == eager two-step expand+crop, bit-exact.

The loader's hot path (odtpu/data/augment.py:random_expand_crop) fuses
Expand and RandomSampleCrop without materializing the expanded canvas.
Parity contract: identical RNG draw sequence and bit-identical pixels/
boxes/labels vs random_expand followed by random_sample_crop (the
eager pair is itself the parity port of the reference's
/root/reference/lib/utils/augmentations.py:149-294)."""

import numpy as np
import pytest

from odtpu.data.augment import (SSDAugmentation, random_expand,
                                random_expand_crop, random_sample_crop)

MEAN = np.array([104.0, 117.0, 123.0], np.float32)


def _case(rng, dtype):
    h = int(rng.integers(40, 220))
    w = int(rng.integers(40, 220))
    img = rng.integers(0, 256, (h, w, 3)).astype(dtype)
    n = int(rng.integers(1, 8))
    b = np.sort(rng.random((n, 2, 2), np.float32), axis=1).reshape(n, 4)
    b[:, 0::2] *= w
    b[:, 1::2] *= h
    labels = rng.integers(0, 20, (n,))
    return img, b, labels


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_fused_matches_eager(dtype):
    case_rng = np.random.default_rng(7)
    for trial in range(200):
        img, boxes, labels = _case(case_rng, dtype)
        seed = 1000 + trial
        ra = np.random.default_rng(seed)
        ia, ba = random_expand(img, boxes, ra, MEAN)
        ia, ba, la = random_sample_crop(ia, ba, labels, ra)
        rb = np.random.default_rng(seed)
        ib, bb, lb = random_expand_crop(img, boxes, labels, rb, MEAN)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(la, lb)
        # the RNG streams must stay aligned (same number of draws)
        assert ra.integers(1 << 30) == rb.integers(1 << 30)


@pytest.mark.parametrize("device_photometric", [True, False])
def test_full_pipeline_unchanged(device_photometric):
    """End-to-end SSDAugmentation output is a pure function of the rng
    seed regardless of the fused rewrite (the dump path still uses the
    eager pair, so both code paths stay live)."""
    case_rng = np.random.default_rng(3)
    aug = SSDAugmentation(size=(300, 300),
                          device_photometric=device_photometric)
    for trial in range(30):
        img, boxes, labels = _case(case_rng, np.uint8)
        boxes_n = boxes.copy()
        boxes_n[:, 0::2] /= img.shape[1]
        boxes_n[:, 1::2] /= img.shape[0]
        o1 = aug(img, boxes_n, labels, np.random.default_rng(trial))
        o2 = aug(img, boxes_n, labels, np.random.default_rng(trial))
        np.testing.assert_array_equal(o1[0], o2[0])
        np.testing.assert_array_equal(o1[1], o2[1])
        np.testing.assert_array_equal(o1[2], o2[2])
