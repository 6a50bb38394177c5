"""Data pipeline tests on synthetic VOC/COCO trees."""

import numpy as np
import pytest

from odtpu.data import (COCODetection, DetLoader, SSDAugmentation,
                        VOCDetection, dataset_factory, pad_batch_to)
from odtpu.data.augment import (photometric_distort, random_expand,
                                random_mirror, random_sample_crop)
from odtpu.utils.config import default_cfg, update_cfg
from synth import make_coco, make_voc


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("VOCdevkit")
    recs = make_voc(str(root), n_images=8)
    return str(root), recs


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    recs = make_coco(str(root), n_images=6)
    return str(root), recs


def test_voc_dataset_reads(voc_root):
    root, recs = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    assert len(ds) == 8
    rec = ds[0]
    h, w, _ = rec["image"].shape
    # normalized, zero-based coords: abs = (stored-1+1)-1 = stored
    want = recs[0][1]
    got = rec["boxes"] * np.array([w, h, w, h], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_array_equal(rec["labels"], recs[0][2])


def test_coco_dataset_reads(coco_root):
    root, recs = coco_root
    ds = COCODetection(root, (("2014", "val"),))
    assert len(ds) == 6
    rec = ds[0]
    # labels contiguous 0..4 (sorted cat ids 1,3,7,18,44)
    assert rec["labels"].max() < 5
    assert ds.label_to_cat[0] == 1 and ds.label_to_cat[4] == 44


def test_eval_transform_shapes(voc_root):
    root, _ = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    rec = ds[0]
    img, boxes, labels = t(rec["image"], rec["boxes"], rec["labels"])
    assert img.shape == (300, 300, 3)
    assert img.dtype == np.float32
    # mean-subtracted: values can be negative
    assert img.min() < 0


def test_train_transform_valid_boxes(voc_root):
    root, _ = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((300, 300))
    rng = np.random.default_rng(0)
    for i in range(8):
        rec = ds[i % len(ds)]
        img, boxes, labels = t(rec["image"], rec["boxes"], rec["labels"],
                               rng=rng)
        assert img.shape == (300, 300, 3)
        assert len(boxes) == len(labels) >= 1
        assert (boxes[:, 2] >= boxes[:, 0]).all()
        assert (boxes[:, 3] >= boxes[:, 1]).all()
        assert boxes.min() >= -1e-6 and boxes.max() <= 1 + 1e-6


def test_augment_ops_reproducible():
    rng1 = np.random.default_rng(42)
    rng2 = np.random.default_rng(42)
    img = np.random.RandomState(0).randint(
        0, 255, (120, 160, 3)).astype(np.float32)
    a = photometric_distort(img.copy(), rng1)
    b = photometric_distort(img.copy(), rng2)
    np.testing.assert_array_equal(a, b)


def test_mirror_geometry():
    img = np.zeros((10, 20, 3), np.float32)
    boxes = np.array([[2.0, 1.0, 8.0, 5.0]], np.float32)

    class FlipRng:
        def integers(self, n):
            return 1
    img2, boxes2 = random_mirror(img, boxes, FlipRng())
    np.testing.assert_allclose(boxes2, [[12.0, 1.0, 18.0, 5.0]])


def test_loader_batches(voc_root):
    root, _ = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=4, max_boxes=10, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 300, 300, 3)
    assert b["boxes"].shape == (4, 10, 4)
    assert b["labels"].shape == (4, 10)
    assert (b["labels"] >= -1).all()
    assert len(b["ids"]) == 4
    # padded rows are -1
    for i in range(4):
        n = (b["labels"][i] >= 0).sum()
        assert (b["labels"][i][n:] == -1).all()


def test_loader_shuffle_differs_by_epoch(voc_root):
    root, _ = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=8, max_boxes=10, shuffle=True,
                       num_workers=1)
    e1 = next(iter(loader))["ids"]
    e2 = next(iter(loader))["ids"]
    assert set(e1) == set(e2)
    assert e1 != e2  # epoch-dependent order


def test_dataset_factory_voc(voc_root):
    root, _ = voc_root
    cfg = default_cfg()
    cfg.DATASET.SUB_DIR = "ignored"
    update_cfg(cfg)
    cfg.DATASET.DATASET_DIR = root
    cfg.DATASET.TEST_SETS = (("2007", "test"),)
    cfg.DATASET.EVAL_BATCH_SIZE = 4
    cfg.DATASET.NUM_WORKERS = 2
    loader = dataset_factory("eval", cfg)
    b = next(iter(loader))
    assert b["images"].shape == (4, 300, 300, 3)


def test_pad_batch_to(voc_root):
    root, _ = voc_root
    ds = VOCDetection(root, (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=5, max_boxes=10, num_workers=1)
    batches = list(loader)
    last, valid = pad_batch_to(batches[-1], 5)
    assert last["images"].shape[0] == 5
    assert valid == 3


def test_device_photometric_stays_uint8():
    """Geometry runs in u8 end to end in device-photometric mode, and a
    zero-GT item (all-difficult image) must keep the batch's uint8
    dtype — an f32 item would promote the stacked batch and retrace the
    train step with doubly-normalized pixels."""
    rng = np.random.default_rng(0)
    aug = SSDAugmentation((300, 300), device_photometric=True)
    img = (rng.integers(0, 255, (240, 320, 3))).astype(np.uint8)
    boxes = np.array([[0.1, 0.1, 0.6, 0.6]], np.float32)
    labels = np.array([3])
    for i in range(8):  # expand/crop/mirror paths all hit over 8 draws
        out, b, l = aug(img, boxes, labels, rng=np.random.default_rng(i))
        assert out.dtype == np.uint8 and out.shape == (300, 300, 3)
    out, b, l = aug(img, np.zeros((0, 4), np.float32),
                    np.zeros((0,), np.int64), rng=rng)
    assert out.dtype == np.uint8 and out.shape == (300, 300, 3)


def test_image_cache_exact_and_isolated(voc_root):
    """Cache hits are byte-identical to cv2.imread and mutation of a
    returned array can't poison later reads (odtpu/data/cache.py)."""
    import cv2
    from odtpu.data.cache import ImageCache

    root, _ = voc_root
    cache = ImageCache(max_gb=1.0)
    ds = VOCDetection(root, (("2007", "test"),), image_cache=cache)
    path = ds.image_path(0)
    direct = cv2.imread(path)

    first = ds[0]["image"]                 # miss: decode + insert
    np.testing.assert_array_equal(first, direct)
    assert cache.stats()["images"] == 1
    first[:] = 0                           # consumer trashes its copy
    second = ds[0]["image"]                # hit
    np.testing.assert_array_equal(second, direct)
    second[:] = 255
    np.testing.assert_array_equal(ds[0]["image"], direct)


def test_image_cache_budget_skips_not_latches(voc_root):
    """An insert over budget is skipped, but later images that fit
    still cache (no terminal 'full' latch)."""
    from odtpu.data.cache import ImageCache

    root, _ = voc_root
    tiny = ImageCache(max_gb=1e-9)  # fits nothing
    ds = VOCDetection(root, (("2007", "test"),), image_cache=tiny)
    a = ds[0]["image"]
    assert tiny.stats()["images"] == 0 and tiny.stats()["refused"] == 1
    b = ds[0]["image"]  # still served, straight from disk
    np.testing.assert_array_equal(a, b)

    one = ImageCache(max_gb=0.0)
    one.max_bytes = a.nbytes  # room for exactly one image
    ds2 = VOCDetection(root, (("2007", "test"),), image_cache=one)
    ds2[0]["image"]
    assert one.stats()["images"] == 1
    ds2[1]["image"]  # over budget: refused...
    assert one.stats()["images"] == 1 and one.stats()["refused"] >= 1
    np.testing.assert_array_equal(ds2[0]["image"], a)  # ...hit still live


def test_shared_cache_per_dataset_root(voc_root):
    from odtpu.data.cache import shared_cache

    root, _ = voc_root
    a = shared_cache(root, 1.0)
    b = shared_cache(root + "/", 2.0)  # same root normalized
    assert a is b  # one budget for train+eval loaders of a run


def test_dataset_factory_cache_flag(voc_root):
    root, _ = voc_root
    cfg = default_cfg()
    update_cfg(cfg)
    cfg.DATASET.DATASET_DIR = root
    cfg.DATASET.TEST_SETS = (("2007", "test"),)
    cfg.DATASET.EVAL_BATCH_SIZE = 4
    cfg.DATASET.NUM_WORKERS = 2
    cfg.DATASET.CACHE_IMAGES = True
    loader = dataset_factory("eval", cfg)
    b1 = next(iter(loader))
    assert loader.dataset.image_cache.stats()["images"] > 0
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1["images"], b2["images"])


def test_photometric_off_geometry_only(voc_root):
    """cfg.DATASET.PHOTOMETRIC=False keeps geometry aug but skips the
    color jitter: every output value stays inside the per-channel
    convex hull of {source color, expand fill} — brightness/contrast
    jitter would leave it. Contract configs on chroma-coded synthetic
    data rely on this (cfgs/tests/coco_synth.yml rationale)."""
    src = np.array([200, 100, 50], np.float32)  # BGR
    mean = np.array([104, 117, 123], np.float32)
    aug = SSDAugmentation((64, 64), tuple(mean), photometric=False)
    img = np.broadcast_to(src.astype(np.uint8), (80, 90, 3)).copy()
    boxes = np.array([[0.1, 0.1, 0.8, 0.8]], np.float32)
    labels = np.array([3])
    for i in range(8):
        out, _, _ = aug(img, boxes, labels, rng=np.random.default_rng(i))
        bgr = out + mean  # undo SubtractMeans
        lo = np.minimum(src, mean) - 1.0  # resize is +-1 LSB fixed-point
        hi = np.maximum(src, mean) + 1.0
        assert (bgr >= lo).all() and (bgr <= hi).all(), i

    # cfg plumbing: dataset_factory propagates the knob
    root, _ = voc_root
    cfg = default_cfg()
    cfg.DATASET.SUB_DIR = "ignored"
    update_cfg(cfg)
    cfg.DATASET.DATASET_DIR = root
    cfg.DATASET.TEST_SETS = (("2007", "test"),)
    cfg.DATASET.PHOTOMETRIC = False
    cfg.DATASET.NUM_WORKERS = 1
    loader = dataset_factory("eval", cfg)
    assert loader.transform.photometric is False
