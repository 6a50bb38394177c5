"""NMS + detect-out tests: greedy semantics vs a numpy oracle that mirrors
the reference while-loop (box_utils.py:279), and the DetectOut contract."""

import numpy as np
import jax.numpy as jnp

from odtpu.ops.nms import nms, nms_mask
from odtpu.ops.detect import detect_out
from odtpu.ops.boxes import decode, encode


def ref_nms_oracle(boxes, scores, overlap, top_k):
    """Numpy restatement of the reference greedy loop semantics."""
    order = np.argsort(-scores, kind="stable")[:top_k]
    keep = []
    alive = list(order)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    while alive:
        i = alive.pop(0)
        keep.append(i)
        rest = []
        for j in alive:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            iou = inter / (areas[i] + areas[j] - inter)
            if iou <= overlap:
                rest.append(j)
        alive = rest
    return keep


def _rand_boxes(rng, n):
    xy1 = rng.uniform(0, 0.7, (n, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (n, 2)).astype(np.float32)
    return np.concatenate([xy1, xy1 + wh], 1)


def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 60
        boxes = _rand_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        want = ref_nms_oracle(boxes, scores, 0.45, 200)
        kb, ks, count = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45,
                            top_k=200)
        assert int(count) == len(want)
        np.testing.assert_allclose(np.asarray(ks)[:len(want)],
                                   scores[want], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(kb)[:len(want)],
                                   boxes[want], rtol=1e-6)


def test_nms_top_k_truncation(rng):
    """Candidates are truncated to top_k BEFORE suppression, like the
    reference (box_utils.py:301)."""
    n, k = 50, 10
    boxes = _rand_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    want = ref_nms_oracle(boxes, scores, 0.45, k)
    kb, ks, count = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=k)
    assert int(count) == len(want)
    np.testing.assert_allclose(np.asarray(ks)[:len(want)], scores[want],
                               rtol=1e-6)


def test_nms_identical_boxes():
    boxes = np.tile(np.array([[0.1, 0.1, 0.5, 0.5]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    _, ks, count = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=5)
    assert int(count) == 1
    assert float(ks[0]) == np.float32(0.9)


def test_nms_mask_alignment(rng):
    n = 40
    boxes = _rand_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.45))
    want = set(ref_nms_oracle(boxes, scores, 0.45, n))
    assert set(np.nonzero(mask)[0].tolist()) == want


def test_detect_out_contract(rng):
    """detect_out returns [B, C, K, 5]; entries match per-class nms of the
    decoded boxes; background row is zero."""
    B, P, C, K = 2, 100, 4, 20
    variances = (0.1, 0.2)
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)
    ], 1).astype(np.float32)
    loc = (rng.randn(B, P, 4) * 0.1).astype(np.float32)
    logits = rng.randn(B, P, C).astype(np.float32)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    out = np.asarray(detect_out(jnp.asarray(loc), jnp.asarray(conf),
                                jnp.asarray(priors), variances,
                                conf_thresh=0.01, nms_thresh=0.45, top_k=K))
    assert out.shape == (B, C, K, 5)
    assert np.all(out[:, 0] == 0)

    decoded = np.asarray(decode(jnp.asarray(loc), jnp.asarray(priors[None]),
                                variances))
    for b in range(B):
        for c in range(1, C):
            scores = conf[b, :, c].copy()
            scores[scores <= 0.01] = 0.0
            want = ref_nms_oracle(decoded[b], scores, 0.45, K)
            want = [i for i in want if scores[i] > 0]
            got = out[b, c]
            nkept = int((got[:, 0] > 0).sum())
            assert nkept == len(want)
            np.testing.assert_allclose(got[:nkept, 0], conf[b, want, c],
                                       rtol=1e-5)
            np.testing.assert_allclose(got[:nkept, 1:], decoded[b, want],
                                       rtol=1e-4, atol=1e-5)


def test_detect_out_cross_class_topk(rng):
    B, P, C, K = 1, 50, 6, 5
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)
    ], 1).astype(np.float32)
    loc = (rng.randn(B, P, 4) * 0.1).astype(np.float32)
    logits = rng.randn(B, P, C).astype(np.float32)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out = np.asarray(detect_out(jnp.asarray(loc), jnp.asarray(conf),
                                jnp.asarray(priors), (0.1, 0.2),
                                top_k=K, cross_class_topk=True))
    assert int((out[..., 0] > 0).sum()) <= K
