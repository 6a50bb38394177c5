"""Independent oracle cross-check of the native COCO evaluator.

pycocotools cannot be installed here (zero egress), so a vendored
known-answer golden is impossible to *generate*. This file closes the
same gap another way: `_oracle_evaluate` is a deliberately naive,
sequential transcription of the published pycocotools algorithm
(COCOeval.evaluateImg's d/g double loop and accumulate()'s per-point
envelope, mirroring the reference's dependency —
/root/reference/lib/utils/evaluate_utils.py:206-222 runs that exact
library), written with none of the vectorizations used by
odtpu/eval/coco_eval.py:

  - matching: explicit per-det per-gt scan with the library's literal
    control flow (`continue` on taken non-crowd gts, `break` when a
    matched det reaches the crowd section, `< iou: continue` so a later
    gt takes equal-IoU ties) vs coco_eval's masked argmax;
  - AP: per-recall-threshold max-scan over raw (recall, precision)
    points vs coco_eval's maximum.accumulate + searchsorted.

Randomized scenarios stress exactly the cases where a vectorization bug
would hide: tied scores, tied IoUs, crowd fallbacks, maxDets overflow,
det-only and gt-only (image, category) pairs.
"""

from __future__ import annotations

import numpy as np
import pytest

from odtpu.eval.coco_eval import (IOU_THRS, MAX_DETS, REC_THRS, _iou_xywh,
                                  evaluate_coco)


def _oracle_match(ious, iscrowd, thr):
    """COCOeval.evaluateImg inner loop, verbatim control flow.

    ious [D, G] for score-sorted dets and ignored-last gts."""
    D, G = ious.shape
    gtm = -np.ones(G, int)
    dtm = -np.ones(D, int)
    dt_ig = np.zeros(D, bool)
    for d in range(D):
        iou = min(thr, 1 - 1e-10)
        m = -1
        for g in range(G):
            if gtm[g] >= 0 and not iscrowd[g]:
                continue  # taken non-crowd gt
            if m > -1 and not iscrowd[m] and iscrowd[g]:
                break  # matched to a real gt; don't trade for a crowd
            if ious[d, g] < iou:
                continue
            iou = ious[d, g]  # later gt wins exact ties (>= passes)
            m = g
        if m == -1:
            continue
        dtm[d] = m
        gtm[m] = d
        dt_ig[d] = bool(iscrowd[m])
    return dtm >= 0, dt_ig


def _oracle_ap(scores, dtm, dt_ig, n_gt):
    """accumulate() for one (category, iou-thr): envelope by direct
    definition — q(r) = max precision over points with recall >= r."""
    order = np.argsort(-scores, kind="mergesort")
    dtm, dt_ig = dtm[order], dt_ig[order]
    keep = ~dt_ig
    tps = np.cumsum(dtm[keep].astype(float))
    fps = np.cumsum((~dtm[keep]).astype(float))
    rc = tps / n_gt
    pr = tps / np.maximum(tps + fps, np.finfo(float).eps)
    q = np.zeros(len(REC_THRS))
    for i, r in enumerate(REC_THRS):
        at_least = pr[rc >= r]
        q[i] = at_least.max() if at_least.size else 0.0
    return q


def _oracle_evaluate(det_rows, gt_index, cat_ids):
    """Full pipeline: per-(img,cat) match at all thresholds, global
    score-sorted accumulate, mean over categories/thresholds."""
    det_rows = np.asarray(det_rows, float).reshape(-1, 7)
    img_ids = sorted({k[0] for k in gt_index})
    T = len(IOU_THRS)
    precision = -np.ones((T, len(REC_THRS), len(cat_ids)))
    for ci, cat in enumerate(cat_ids):
        per_img = []
        n_gt = 0
        for img in img_ids:
            gt = gt_index.get((img, cat), [])
            dt = [r for r in det_rows if r[0] == img and r[6] == cat]
            dt = sorted(dt, key=lambda r: -r[5])[:MAX_DETS]
            gts = sorted(gt, key=lambda g: g[4])  # ignored (crowd) last
            iscrowd = np.array([g[4] for g in gts], bool)
            n_gt += int((~iscrowd).sum())
            D, G = len(dt), len(gts)
            scores = np.array([r[5] for r in dt])
            dtm = np.zeros((T, D), bool)
            dt_ig = np.zeros((T, D), bool)
            if D and G:
                ious = _iou_xywh(np.array([r[1:5] for r in dt]),
                                 np.array([g[:4] for g in gts]), iscrowd)
                for t, thr in enumerate(IOU_THRS):
                    dtm[t], dt_ig[t] = _oracle_match(ious, iscrowd, thr)
            per_img.append((scores, dtm, dt_ig))
        if n_gt == 0:
            continue
        scores = np.concatenate([p[0] for p in per_img])
        dtm = np.concatenate([p[1] for p in per_img], axis=1)
        dt_ig = np.concatenate([p[2] for p in per_img], axis=1)
        for t in range(T):
            precision[t, :, ci] = _oracle_ap(scores, dtm[t], dt_ig[t],
                                             n_gt)
    p05 = precision[0]
    map05 = float(np.mean(p05[p05 > -1])) if (p05 > -1).any() else 0.0
    map95 = (float(np.mean(precision[precision > -1]))
             if (precision > -1).any() else 0.0)
    return map05, map95


def _random_scenario(rng):
    """Small random eval problem dense in edge cases: quantized
    coordinates (IoU ties), quantized scores (score ties), crowds,
    per-(img,cat) det counts that can exceed MAX_DETS."""
    n_img = rng.randint(2, 6)
    cats = list(range(1, rng.randint(2, 4)))
    gt_index = {}
    det_rows = []
    for img in range(n_img):
        for cat in cats:
            n_gt = rng.randint(0, 5)
            rows = []
            for _ in range(n_gt):
                x, y = rng.randint(0, 4, 2) * 8.0
                w, h = rng.randint(1, 4, 2) * 8.0
                rows.append((x, y, w, h, int(rng.rand() < 0.25)))
            if rows or rng.rand() < 0.5:
                gt_index[(float(img), float(cat))] = rows
            n_dt = rng.randint(0, MAX_DETS + 20) if rng.rand() < 0.1 \
                else rng.randint(0, 8)
            for _ in range(n_dt):
                x, y = rng.randint(0, 4, 2) * 8.0
                w, h = rng.randint(1, 4, 2) * 8.0
                score = rng.randint(1, 20) / 20.0  # heavy ties
                det_rows.append((float(img), x, y, w, h, score,
                                 float(cat)))
    if not gt_index:  # ensure at least one annotated pair
        gt_index[(0.0, float(cats[0]))] = [(0.0, 0.0, 8.0, 8.0, 0)]
    return det_rows, gt_index, [float(c) for c in cats]


@pytest.mark.parametrize("seed", range(20))
def test_native_matches_sequential_oracle(seed):
    rng = np.random.RandomState(1234 + seed)
    det_rows, gt_index, cats = _random_scenario(rng)
    got = evaluate_coco(det_rows, gt_index, cats)
    want = _oracle_evaluate(det_rows, gt_index, cats)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_oracle_known_answer_hand_case():
    """One fully hand-checkable case pinning both implementations:
    a single category, two images, one crowd fallback, one miss.

    img0: gt (0,0,10,10); dets score .9 IoU=1 (TP at every thr) and
    score .8 duplicate (FP; gt taken).  img1: crowd gt (0,0,10,10) and
    non-crowd gt (20,20,10,10); det score .7 on the crowd box -> crowd
    fallback => ignored, det score .6 at (40,40,10,10) -> FP.
    n_gt = 2 (crowd excluded).  Ranked kept dets: TP(.9), FP(.8),
    FP(.6).  recall hits 0.5 at rank1 (p=1.0) and never 1.0 =>
    AP = mean over 101 pts: 51 pts of 1.0, rest 0 = 51/101."""
    gt_index = {
        (0.0, 1.0): [(0.0, 0.0, 10.0, 10.0, 0)],
        (1.0, 1.0): [(0.0, 0.0, 10.0, 10.0, 1),
                     (20.0, 20.0, 10.0, 10.0, 0)],
    }
    det_rows = [
        (0.0, 0.0, 0.0, 10.0, 10.0, 0.9, 1.0),
        (0.0, 0.0, 0.0, 10.0, 10.0, 0.8, 1.0),
        (1.0, 0.0, 0.0, 10.0, 10.0, 0.7, 1.0),
        (1.0, 40.0, 40.0, 10.0, 10.0, 0.6, 1.0),
    ]
    want = 51.0 / 101.0
    for impl in (evaluate_coco, _oracle_evaluate):
        m05, m95 = impl(det_rows, gt_index, [1.0])
        np.testing.assert_allclose(m05, want, atol=1e-12)
        np.testing.assert_allclose(m95, want, atol=1e-12)
