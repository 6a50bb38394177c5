"""COCO-style detection evaluation.

Parity target: /root/reference/lib/utils/evaluate_utils.py:206-222
(EvalCOCO.evaluate_stats) which runs pycocotools COCOeval and extracts
mAP@0.5 and mAP@[.5:.95]. pycocotools is not guaranteed present in this
environment, so this module ships a native implementation of the bbox
protocol (IoU thresholds .5:.05:.95, 101-point interpolated precision,
area=all, maxDets=100, crowd GTs ignored-by-match) and uses pycocotools
instead when importable — both return (mAP@0.5, mAP@[.5:.95]).

Detections are rows [coco_img_id, x, y, w, h, score, coco_cat_id]
(the reference's loadRes row format, evaluate_utils.py:199).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_xywh(dets, gts, iscrowd):
    """IoU between det [D,4] and gt [G,4] xywh boxes; crowd GT uses
    intersection-over-det-area (pycocotools semantics)."""
    D, G = len(dets), len(gts)
    ious = np.zeros((D, G))
    for g in range(G):
        gx, gy, gw, gh = gts[g]
        garea = gw * gh
        for d in range(D):
            dx, dy, dw, dh = dets[d]
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            if iw <= 0:
                continue
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[g] else dw * dh + garea - inter
            ious[d, g] = inter / union
    return ious


def _evaluate_img(det_rows, gt_rows):
    """Greedy matching for one (image, category) across all IoU thrs.

    det_rows: [(score, x, y, w, h)] ; gt_rows: [(x, y, w, h, iscrowd)]
    Returns (dt_scores sorted desc, dtm [T, D] matched-gt flag,
    dt_ignore [T, D], n_gt_nonignored).
    """
    det_rows = sorted(det_rows, key=lambda r: -r[0])[:MAX_DETS]
    D = len(det_rows)
    gts = sorted(gt_rows, key=lambda r: r[4])  # non-crowd first
    G = len(gts)
    iscrowd = np.array([g[4] for g in gts], bool)
    n_gt = int((~iscrowd).sum())
    T = len(IOU_THRS)
    dtm = np.zeros((T, D), bool)
    dt_ig = np.zeros((T, D), bool)
    if D == 0:
        return np.zeros(0), dtm, dt_ig, n_gt
    scores = np.array([r[0] for r in det_rows])
    if G == 0:
        return scores, dtm, dt_ig, n_gt
    ious = _iou_xywh(np.array([r[1:5] for r in det_rows]),
                     np.array([g[:4] for g in gts]), iscrowd)
    for t, thr in enumerate(IOU_THRS):
        gtm = np.zeros(G, bool)
        for d in range(D):
            best, bestg = min(thr, 1 - 1e-10), -1
            for g in range(G):
                if gtm[g] and not iscrowd[g]:
                    continue
                # once matched to a non-ignored gt, stop considering crowd
                if bestg > -1 and not iscrowd[bestg] and iscrowd[g]:
                    break
                if ious[d, g] < best:
                    continue
                best, bestg = ious[d, g], g
            if bestg == -1:
                continue
            dtm[t, d] = True
            dt_ig[t, d] = iscrowd[bestg]
            gtm[bestg] = True
    return scores, dtm, dt_ig, n_gt


def evaluate_coco(det_rows, gt_index, cat_ids):
    """Native COCO bbox evaluation.

    Args:
        det_rows: array-like [N, 7]: img_id, x, y, w, h, score, cat_id.
        gt_index: {(img_id, cat_id): [(x, y, w, h, iscrowd), ...]} — must
            contain a key for every annotated (image, cat) pair; images
            come from its keys.
        cat_ids: category ids to evaluate.
    Returns:
        (mAP@0.5, mAP@[.5:.95]) floats in [0, 1].
    """
    det_rows = np.asarray(det_rows, float).reshape(-1, 7)
    img_ids = sorted({k[0] for k in gt_index})
    T, R = len(IOU_THRS), len(REC_THRS)
    precision = -np.ones((T, R, len(cat_ids)))

    dets_by = {}
    for r in det_rows:
        dets_by.setdefault((r[0], r[6]), []).append(
            (r[5], r[1], r[2], r[3], r[4]))

    for ci, cat in enumerate(cat_ids):
        all_scores, all_dtm, all_dtig = [], [], []
        n_gt = 0
        for img in img_ids:
            gt = gt_index.get((img, cat), [])
            dt = dets_by.get((img, cat), [])
            if not gt and not dt:
                continue
            s, dtm, dtig, ng = _evaluate_img(dt, gt)
            all_scores.append(s)
            all_dtm.append(dtm)
            all_dtig.append(dtig)
            n_gt += ng
        if n_gt == 0:
            continue
        if all_scores:
            scores = np.concatenate(all_scores)
            dtm = np.concatenate(all_dtm, axis=1)
            dtig = np.concatenate(all_dtig, axis=1)
            order = np.argsort(-scores, kind="mergesort")
            dtm, dtig = dtm[:, order], dtig[:, order]
        else:
            dtm = np.zeros((T, 0), bool)
            dtig = np.zeros((T, 0), bool)
        for t in range(T):
            keep = ~dtig[t]
            tp = np.cumsum(dtm[t][keep])
            fp = np.cumsum(~dtm[t][keep])
            nd = len(tp)
            rc = tp / n_gt
            pr = tp / np.maximum(tp + fp, np.finfo(float).eps)
            # precision envelope + 101-point sampling (pycocotools style)
            q = np.zeros(R)
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[t, :, ci] = q

    p05 = precision[0]
    map05 = float(np.mean(p05[p05 > -1])) if (p05 > -1).any() else 0.0
    pall = precision
    map95 = float(np.mean(pall[pall > -1])) if (pall > -1).any() else 0.0
    return map05, map95


def build_gt_index(dataset):
    """Build {(img_id, cat_id): [(x,y,w,h,iscrowd)]} from a COCODetection
    dataset's parsed annotations."""
    index = {}
    for (path, img_id, (w, h), anns) in dataset.items:
        for a in anns:
            key = (float(img_id), float(a["category_id"]))
            x, y, bw, bh = a["bbox"]
            index.setdefault(key, []).append(
                (x, y, bw, bh, int(a.get("iscrowd", 0))))
    return index


def evaluate_with_pycocotools(det_rows, anno_file, img_ids):
    """pycocotools path (identical to evaluate_utils.py:206-222)."""
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval
    coco = COCO(anno_file)
    pred = coco.loadRes(np.asarray(det_rows, float))
    e = COCOeval(coco, pred, "bbox")
    e.params.imgIds = list(img_ids)
    e.evaluate()
    e.accumulate()
    e.summarize()
    ap05 = e.eval["precision"][0, :, :, 0, 2]
    ap95 = e.eval["precision"][:, :, :, 0, 2]
    return (float(np.mean(ap05[ap05 > -1])),
            float(np.mean(ap95[ap95 > -1])))
