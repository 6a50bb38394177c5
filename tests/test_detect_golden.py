"""Full DetectOut contract parity against the reference eval path.

Fixture produced by executing the reference's detection.py (DetectOut)
+ box_utils on seed-123 inputs — covers decode, per-class threshold,
greedy NMS and output packing in one shot."""

import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from odtpu.ops.detect import detect_out

GOLDEN = osp.join(osp.dirname(__file__), "goldens",
                  "reference_detect_out.npz")


@pytest.mark.parametrize("impl", ["lax"])
def test_detect_out_matches_reference(impl):
    g = np.load(GOLDEN)
    got = np.asarray(detect_out(jnp.asarray(g["loc"]),
                                jnp.asarray(g["conf"]),
                                jnp.asarray(g["priors"]), (0.1, 0.2),
                                conf_thresh=0.01, nms_thresh=0.45,
                                top_k=50, impl=impl))
    want = g["out"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
