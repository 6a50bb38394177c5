"""Prior-box generation tests: SSD300 canonical counts, flip equivalence
(mirrors the reference's inline tests, prior_box.py:149-191), clipping."""

import numpy as np

from odtpu.ops.priors import PriorBoxSSD
from odtpu.utils.config import default_cfg

SSD300_DIMS = [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]


def test_ssd300_counts():
    cfg = default_cfg()
    p = PriorBoxSSD(cfg)
    assert p.num_priors == [4, 6, 6, 6, 4, 4]
    priors = p(SSD300_DIMS)
    assert priors.shape == (8732, 4)
    assert priors.dtype == np.float32


def test_first_cell_values():
    """First 38x38 cell: center (0.5/38*... ), min square 30/300=0.1,
    sqrt(30*60)/300, AR-2 pair."""
    cfg = default_cfg()
    p = PriorBoxSSD(cfg)
    priors = p(SSD300_DIMS)
    c = 0.5 / (300 / 8)  # = (j+0.5)/steps_x with steps_x = 300/8
    s = 30 / 300
    sp = np.sqrt((30 / 300) * (60 / 300))
    r = np.sqrt(2.0)
    expect = np.array([
        [c, c, s, s],
        [c, c, sp, sp],
        [c, c, s * r, s / r],
        [c, c, s / r, s * r],
    ], dtype=np.float32)
    np.testing.assert_allclose(priors[:4], expect, rtol=1e-6)


def test_flip_equivalence():
    """FLIP=True with AR [2] == FLIP=False with AR [2, 0.5]
    (reference test_filp, prior_box.py:161-175)."""
    cfg1 = default_cfg()
    p1 = PriorBoxSSD(cfg1)(SSD300_DIMS)

    cfg2 = default_cfg()
    cfg2.MODEL.FLIP = False
    cfg2.MODEL.ASPECT_RATIOS = [[2, 1 / 2], [2, 1 / 2, 3, 1 / 3],
                                [2, 1 / 2, 3, 1 / 3], [2, 1 / 2, 3, 1 / 3],
                                [2, 1 / 2], [2, 1 / 2]]
    p2 = PriorBoxSSD(cfg2)(SSD300_DIMS)
    assert abs((p2 - p1)).sum() < 1e-6


def test_rectangle_input():
    """Non-square input: (600, 300) image with doubled-height feature maps
    (reference test_rectangle, prior_box.py:178-191)."""
    cfg = default_cfg()
    cfg.DATASET.IMAGE_SIZE = (600, 300)
    cfg.MODEL.IMAGE_SIZE = (600, 300)
    p = PriorBoxSSD(cfg)
    dims = [(h * 2, w) for (h, w) in SSD300_DIMS]
    priors = p(dims)
    assert priors.shape == (8732 * 2, 4)
    # min square anchor is anisotropic in normalized coords: w=30/300, h=30/600
    np.testing.assert_allclose(priors[0, 2], 30 / 300, rtol=1e-6)
    np.testing.assert_allclose(priors[0, 3], 30 / 600, rtol=1e-6)


def test_clip_quirk_center_size():
    """CLIP clamps the center-size tensor (reference prior_box.py:108-110):
    large anchors keep w,h <= 1 but their point form may exceed [0,1]."""
    cfg = default_cfg()
    p = PriorBoxSSD(cfg)
    priors = p(SSD300_DIMS)
    assert priors.min() >= 0.0 and priors.max() <= 1.0
    # the 315-sized square (sqrt(264*315)/300 > 0.96) is NOT shrunk below 1
    cfg2 = default_cfg()
    cfg2.MODEL.CLIP = False
    p2 = PriorBoxSSD(cfg2)(SSD300_DIMS)
    assert p2.max() > 1.0  # unclipped some value exceeds 1


def test_ssd512_spec():
    """7-map SSD512 anchor spec (cfgs/vgg/ssd_vgg16_voc_image512.yml)."""
    cfg = default_cfg()
    cfg.DATASET.IMAGE_SIZE = (512, 512)
    cfg.MODEL.IMAGE_SIZE = (512, 512)
    cfg.MODEL.STEPS = [8, 16, 32, 64, 128, 256, 512]
    cfg.MODEL.MIN_SIZES = [35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8]
    cfg.MODEL.MAX_SIZES = [76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]
    p = PriorBoxSSD(cfg)
    assert p.num_priors == [4, 6, 6, 6, 6, 4, 4]
    dims = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    priors = p(dims)
    expected = sum(a * h * w for a, (h, w) in zip(p.num_priors, dims))
    assert priors.shape == (expected, 4)
