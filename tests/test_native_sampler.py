"""Native (C++) fused sampler parity: bit-exact vs numpy/cv2.

odtpu/data/_native fuses virtual-canvas compose + x-flip + uint8
INTER_LINEAR resize into one pass. Contracts verified here:
  1. pure resize == cv2.resize(..., INTER_LINEAR) on uint8, bit-exact
     (OpenCV's 11-bit fixed-point scheme, see sampler.cc header);
  2. fused compose+flip+resize == materialized canvas + numpy flip +
     cv2.resize, bit-exact;
  3. the SSDAugmentation device-photometric path produces identical
     images/boxes/labels with the native sampler on and off (same RNG
     sequence by construction — both consume sample_expand_crop_geometry).
Reference semantics being fused: /root/reference/lib/utils/
augmentations.py:88-94 (Resize), 160-190 (Expand), 192-294 (crop),
325-335 (mirror).
"""

import cv2
import numpy as np
import pytest

from odtpu.data import _native
from odtpu.data.augment import SSDAugmentation

pytestmark = pytest.mark.skipif(
    not _native.available, reason="native sampler unavailable (no g++?)")


def test_resize_parity_vs_cv2():
    rng = np.random.RandomState(11)
    for _ in range(120):
        h, w = rng.randint(1, 90), rng.randint(1, 90)
        oh, ow = rng.randint(1, 120), rng.randint(1, 120)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        ref = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        got = _native.fused_sample_u8(img, 0, 0, (0, 0, w, h), False,
                                      (0, 0, 0), (oh, ow))
        np.testing.assert_array_equal(ref, got)


def test_fused_canvas_flip_resize_parity():
    rng = np.random.RandomState(5)
    for _ in range(120):
        h, w = rng.randint(4, 64), rng.randint(4, 64)
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        fill = rng.randint(0, 256, 3).astype(np.uint8)
        ch, cw = rng.randint(h, 3 * h + 1), rng.randint(w, 3 * w + 1)
        top, left = rng.randint(0, ch - h + 1), rng.randint(0, cw - w + 1)
        x1 = rng.randint(0, cw - 1)
        x2 = rng.randint(x1 + 1, cw + 1)
        y1 = rng.randint(0, ch - 1)
        y2 = rng.randint(y1 + 1, ch + 1)
        flip = bool(rng.randint(2))
        oh, ow = rng.randint(1, 80), rng.randint(1, 80)

        canvas = np.empty((ch, cw, 3), np.uint8)
        canvas[:] = fill
        canvas[top:top + h, left:left + w] = img
        win = canvas[y1:y2, x1:x2]
        if flip:
            win = win[:, ::-1]
        ref = cv2.resize(np.ascontiguousarray(win), (ow, oh),
                         interpolation=cv2.INTER_LINEAR)
        got = _native.fused_sample_u8(img, top, left, (x1, y1, x2, y2),
                                      flip, fill, (oh, ow))
        np.testing.assert_array_equal(ref, got)


def _case(rng):
    h = int(rng.integers(40, 220))
    w = int(rng.integers(40, 220))
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    n = int(rng.integers(1, 8))
    b = np.sort(rng.random((n, 2, 2), np.float32), axis=1).reshape(n, 4)
    labels = rng.integers(0, 20, (n,))
    return img, b, labels


def test_pipeline_native_matches_python(monkeypatch):
    aug = SSDAugmentation(size=(300, 300), device_photometric=True)
    case_rng = np.random.default_rng(23)
    for trial in range(60):
        img, boxes_n, labels = _case(case_rng)
        o_native = aug(img, boxes_n.copy(), labels,
                       np.random.default_rng(trial))
        with monkeypatch.context() as m:
            m.setattr(_native, "available", False)
            o_py = aug(img, boxes_n.copy(), labels,
                       np.random.default_rng(trial))
        np.testing.assert_array_equal(o_native[0], o_py[0])
        np.testing.assert_allclose(o_native[1], o_py[1], rtol=0, atol=0)
        np.testing.assert_array_equal(o_native[2], o_py[2])
        assert o_native[0].dtype == np.uint8
