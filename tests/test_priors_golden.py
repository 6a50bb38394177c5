"""Prior tensors match the reference generator element-for-element
(fixture produced by executing the reference PriorBoxSSD for the SSD300
defaults and the SSD512 spec)."""

import os.path as osp

import numpy as np
import pytest

from odtpu.ops.priors import PriorBoxSSD
from odtpu.utils.config import default_cfg

GOLDEN = osp.join(osp.dirname(__file__), "goldens",
                  "reference_priors.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_ssd300_priors_exact(g):
    cfg = default_cfg()
    p = PriorBoxSSD(cfg)
    assert p.num_priors == list(g["n300"])
    ours = p([(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)])
    np.testing.assert_allclose(ours, g["p300"], rtol=0, atol=2e-7)


def test_ssd512_priors_exact(g):
    cfg = default_cfg()
    cfg.DATASET.IMAGE_SIZE = (512, 512)
    cfg.MODEL.IMAGE_SIZE = (512, 512)
    cfg.MODEL.STEPS = [8, 16, 32, 64, 128, 256, 512]
    cfg.MODEL.MIN_SIZES = [35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8]
    cfg.MODEL.MAX_SIZES = [76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2, 3], [2],
                               [2]]
    p = PriorBoxSSD(cfg)
    assert p.num_priors == list(g["n512"])
    ours = p([(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2),
              (1, 1)])
    np.testing.assert_allclose(ours, g["p512"], rtol=0, atol=2e-7)
