"""Loader reproducibility: same seed + epoch -> identical augmented
batches regardless of worker count or scheduling."""

import numpy as np

from odtpu.data import DetLoader, SSDAugmentation, VOCDetection
from synth import make_voc


def _batches(root, workers, seed=5):
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((64, 64))
    loader = DetLoader(ds, t, batch_size=2, max_boxes=8, shuffle=True,
                       num_workers=workers, seed=seed)
    return list(loader)


def test_same_across_worker_counts(tmp_path):
    root = str(tmp_path / "VOCdevkit")
    make_voc(root, n_images=6, seed=3)
    a = _batches(root, workers=1)
    b = _batches(root, workers=4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["images"], y["images"])
        np.testing.assert_array_equal(x["boxes"], y["boxes"])
        np.testing.assert_array_equal(x["labels"], y["labels"])
        assert x["ids"] == y["ids"]
