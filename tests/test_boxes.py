"""Unit tests for odtpu.ops.boxes against hand-computed values and
round-trip/property checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from odtpu.ops import boxes as B


def test_point_center_roundtrip(rng):
    cs = np.abs(rng.randn(50, 4)).astype(np.float32)
    pf = B.point_form(jnp.asarray(cs))
    back = B.center_size(pf)
    np.testing.assert_allclose(np.asarray(back), cs, rtol=1e-5, atol=1e-6)


def test_point_form_values():
    cs = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    pf = np.asarray(B.point_form(cs))
    np.testing.assert_allclose(pf, [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)


def test_jaccard_hand_values():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0],     # identical -> 1
                   [0.5, 0.5, 1.5, 1.5],     # quarter overlap -> 0.25/1.75
                   [2.0, 2.0, 3.0, 3.0]])    # disjoint -> 0
    iou = np.asarray(B.jaccard(a, b))
    np.testing.assert_allclose(iou, [[1.0, 0.25 / 1.75, 0.0]], atol=1e-6)


def test_jaccard_batched_matches_loop(rng):
    a = np.sort(rng.rand(3, 5, 2, 2).astype(np.float32), axis=2)
    a = a.reshape(3, 5, 4)[..., [0, 2, 1, 3]]  # xyxy with x1<x2, y1<y2
    b = np.sort(rng.rand(3, 7, 2, 2).astype(np.float32), axis=2)
    b = b.reshape(3, 7, 4)[..., [0, 2, 1, 3]]
    batched = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    for i in range(3):
        single = np.asarray(B.jaccard(jnp.asarray(a[i]), jnp.asarray(b[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)


def test_iog():
    gt = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    pred = jnp.array([[0.0, 0.0, 0.5, 1.0]])
    np.testing.assert_allclose(np.asarray(B.iog(gt, pred)), [0.5], atol=1e-6)


def test_encode_decode_roundtrip(rng):
    variances = (0.1, 0.2)
    priors = np.stack([
        rng.uniform(0.2, 0.8, 100), rng.uniform(0.2, 0.8, 100),
        rng.uniform(0.05, 0.3, 100), rng.uniform(0.05, 0.3, 100)
    ], axis=1).astype(np.float32)
    gt_c = priors + rng.randn(100, 4).astype(np.float32) * 0.01
    gt = np.asarray(B.point_form(jnp.asarray(gt_c)))
    enc = B.encode(jnp.asarray(gt), jnp.asarray(priors), variances)
    dec = np.asarray(B.decode(enc, jnp.asarray(priors), variances))
    np.testing.assert_allclose(dec, gt, rtol=1e-3, atol=1e-4)


def test_encode_hand_value():
    # prior == gt -> offsets are 0 except the log eps
    variances = (0.1, 0.2)
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    gt = B.point_form(priors)
    enc = np.asarray(B.encode(gt, priors, variances))
    np.testing.assert_allclose(enc[0, :2], [0.0, 0.0], atol=1e-6)
    # log(1 + 1e-10/0.2-ish) / 0.2 ~ tiny but not exactly 0 (reference eps quirk)
    np.testing.assert_allclose(enc[0, 2:], [0.0, 0.0], atol=1e-6)


def test_decode_hand_value():
    variances = (0.1, 0.2)
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    loc = jnp.array([[1.0, -1.0, 0.0, float(np.log(2.0) / 0.2)]])
    dec = np.asarray(B.decode(loc, priors, variances))
    # cx = 0.5 + 1*0.1*0.2 = 0.52 ; cy = 0.48 ; w = 0.2 ; h = 0.4
    np.testing.assert_allclose(dec, [[0.42, 0.28, 0.62, 0.68]], atol=1e-5)


def test_log_sum_exp_matches_naive(rng):
    x = rng.randn(32, 21).astype(np.float32) * 10
    ours = np.asarray(B.log_sum_exp(jnp.asarray(x)))
    naive = np.log(np.sum(np.exp(x - x.max()), axis=1, keepdims=True)) + x.max()
    np.testing.assert_allclose(ours, naive, rtol=1e-5)
