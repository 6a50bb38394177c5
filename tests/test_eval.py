"""Eval harness tests: AP math on hand-built cases, perfect-detector
sanity on synthetic VOC/COCO, end-to-end eval solver with a fake net."""

import numpy as np
import pytest

from odtpu.eval.voc_eval import eval_class, voc_ap, evaluate_detections
from odtpu.eval.coco_eval import evaluate_coco
from synth import make_voc, make_coco


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)


def test_voc_ap_11pt_hand_value():
    # one TP then one FP: rec=[1,1], prec=[1,0.5] for a single GT
    rec = np.array([1.0, 1.0])
    prec = np.array([1.0, 0.5])
    assert voc_ap(rec, prec, True) == pytest.approx(1.0)
    # TP at rank 2 after FP at rank 1: rec=[0,1], prec=[0,0.5]
    rec = np.array([0.0, 1.0])
    prec = np.array([0.0, 0.5])
    # 11pt: p=0.5 at all t (max prec where rec>=t) except... rec>=0 -> 0.5
    assert voc_ap(rec, prec, True) == pytest.approx(0.5)


def test_eval_class_greedy_double_detection():
    """Second detection on the same GT is a FP."""
    gt = {"img0": {"bbox": [[0, 0, 10, 10]], "difficult": [0]}}
    dets = [("img0", 0.9, 0, 0, 10, 10), ("img0", 0.8, 0, 0, 10, 10)]
    rec, prec, ap = eval_class(dets, gt)
    np.testing.assert_allclose(rec, [1.0, 1.0])
    np.testing.assert_allclose(prec, [1.0, 0.5])


def test_eval_class_difficult_excluded():
    gt = {"img0": {"bbox": [[0, 0, 10, 10]], "difficult": [1]}}
    dets = [("img0", 0.9, 0, 0, 10, 10)]
    rec, prec, ap = eval_class(dets, gt)
    # matching a difficult GT: neither TP nor FP; npos = 0
    assert float(prec[-1]) == 0.0


def test_voc_perfect_detector(tmp_path):
    """Feeding the GT back as detections gives mAP 1.0 on present classes."""
    recs = make_voc(str(tmp_path / "VOCdevkit"), n_images=6, seed=3)
    from odtpu.data import VOCDetection
    ds = VOCDetection(str(tmp_path / "VOCdevkit"), (("2007", "test"),))
    results = [[np.zeros((0, 5), np.float32) for _ in range(len(ds))]
               for _ in range(21)]
    for i, (img_id, boxes, labels) in enumerate(recs):
        for b, l in zip(boxes, labels):
            row = np.array([[b[0], b[1], b[2], b[3], 0.9]], np.float32)
            results[l + 1][i] = np.concatenate([results[l + 1][i], row])
    res, mAP = evaluate_detections(results, ds, str(tmp_path / "out"))
    assert mAP == pytest.approx(1.0, abs=1e-6)


def test_voc_results_files_written(tmp_path):
    make_voc(str(tmp_path / "VOCdevkit"), n_images=4, seed=1)
    from odtpu.data import VOCDetection
    ds = VOCDetection(str(tmp_path / "VOCdevkit"), (("2007", "test"),))
    results = [[np.zeros((0, 5), np.float32) for _ in range(len(ds))]
               for _ in range(21)]
    results[1][0] = np.array([[10, 20, 30, 40, 0.7]], np.float32)
    evaluate_detections(results, ds, str(tmp_path / "out"))
    f = tmp_path / "out" / "det_test_aeroplane.txt"
    line = f.read_text().strip()
    # 1-based coords, %.3f score, %.1f coords (reference format)
    assert line == "000000 0.700 11.0 21.0 31.0 41.0"


def test_coco_eval_perfect():
    gt_index = {
        (1.0, 1.0): [(10, 10, 20, 20, 0)],
        (2.0, 3.0): [(5, 5, 30, 30, 0), (50, 50, 20, 20, 0)],
    }
    rows = [
        (1.0, 10, 10, 20, 20, 0.9, 1.0),
        (2.0, 5, 5, 30, 30, 0.8, 3.0),
        (2.0, 50, 50, 20, 20, 0.7, 3.0),
    ]
    map05, map95 = evaluate_coco(rows, gt_index, [1.0, 3.0])
    assert map05 == pytest.approx(1.0)
    assert map95 == pytest.approx(1.0)


def test_coco_eval_localization_quality_affects_map95():
    """A det with IoU ~0.6 counts at thr .5/.55/.6 but not above."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 0)]}
    # det shifted: x in [0,12] y [0,10] w=12 -> IoU = 10*10/(12*10) = .833
    rows = [(1.0, 0, 0, 12, 10, 0.9, 1.0)]
    map05, map95 = evaluate_coco(rows, gt_index, [1.0])
    assert map05 == pytest.approx(1.0)
    assert 0.5 < map95 < 1.0


def test_coco_eval_crowd_ignored():
    """A det matching only a crowd GT is ignored (not FP)."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 1), (50, 50, 10, 10, 0)]}
    rows = [(1.0, 0, 0, 10, 10, 0.9, 1.0),
            (1.0, 50, 50, 10, 10, 0.8, 1.0)]
    map05, _ = evaluate_coco(rows, gt_index, [1.0])
    assert map05 == pytest.approx(1.0)


def test_coco_eval_crowd_plus_fp_hand_value():
    """Adversarial mix: TP + crowd-ignored det + pure FP.

    pycocotools semantics (evaluateImg + accumulate): the crowd-matched
    det drops out of both TP and FP streams, so the kept sequence at
    thr .5 is [TP(.9), FP(.7)] over n_gt=1 non-crowd GT ->
    rc=[1,1], pr=[1,.5]; envelope leaves pr[0]=1 and every recall
    sample point takes index 0 -> AP@0.5 = 1.0 exactly."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 0), (30, 0, 10, 10, 1)]}
    rows = [(1.0, 0, 0, 10, 10, 0.9, 1.0),     # IoU 1.0 with normal GT
            (1.0, 30, 0, 10, 7, 0.8, 1.0),     # IoG 0.7 with crowd GT
            (1.0, 60, 60, 5, 5, 0.7, 1.0)]     # matches nothing: FP
    map05, _ = evaluate_coco(rows, gt_index, [1.0])
    assert map05 == pytest.approx(1.0)


def test_coco_eval_duplicate_scores_stable_order():
    """Equal-score dets keep insertion order (mergesort stability), and
    AP is order-sensitive: FP-before-TP at the same score gives
    pr=[0,.5] -> envelope .5 everywhere -> AP=0.5; TP-first gives 1.0."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 0)]}
    fp_first = [(1.0, 60, 60, 5, 5, 0.9, 1.0),
                (1.0, 0, 0, 10, 10, 0.9, 1.0)]
    tp_first = list(reversed(fp_first))
    assert evaluate_coco(fp_first, gt_index, [1.0])[0] == pytest.approx(0.5)
    assert evaluate_coco(tp_first, gt_index, [1.0])[0] == pytest.approx(1.0)


def test_coco_eval_maxdets_truncation():
    """Only the top-100 dets per (image, cat) enter matching: a TP
    ranked 120th by score is truncated away -> AP 0; ranked 50th it
    survives the cap and the 99 higher-scored FPs precede it ->
    pr at the single recall point = 1/100."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 0)]}

    def rows_with_tp_at(rank, n=150):
        rows = []
        for i in range(n):
            score = 1.0 - i * 0.005
            if i == rank:
                rows.append((1.0, 0, 0, 10, 10, score, 1.0))
            else:
                rows.append((1.0, 200 + i * 20, 200, 5, 5, score, 1.0))
        return rows

    map05_gone, _ = evaluate_coco(rows_with_tp_at(120), gt_index, [1.0])
    assert map05_gone == pytest.approx(0.0)
    map05_kept, _ = evaluate_coco(rows_with_tp_at(50), gt_index, [1.0])
    # kept sequence: 50 FPs, TP, 49 FPs -> pr at recall 1.0 is 1/51;
    # envelope propagates max(1/51, tail ~1/100) = 1/51 to all samples
    assert map05_kept == pytest.approx(1.0 / 51.0)


def test_coco_eval_iou_tie_later_gt_wins():
    """pycocotools' `< iou: continue` scan means the LATER gt wins an
    exact IoU tie. det1 ties G0/G1 at IoU .538 and must take G1; det2
    (exactly G1, IoU 1.0 but G1 now matched, IoU .25 vs G0) becomes FP.
    tp=[1,1] fp=[0,1] over n_gt=2 -> rc=.5, pr=[1,.5] -> AP@0.5 =
    51/101 (recall samples .00-.50 get precision 1, rest 0)."""
    gt_index = {(1.0, 1.0): [(0, 0, 10, 10, 0), (6, 0, 10, 10, 0)]}
    rows = [(1.0, 3, 0, 10, 10, 0.9, 1.0),
            (1.0, 6, 0, 10, 10, 0.8, 1.0)]
    map05, _ = evaluate_coco(rows, gt_index, [1.0])
    assert map05 == pytest.approx(51.0 / 101.0)


def test_coco_eval_scale_throughput():
    """5000 synthetic images x 4 dets across 20 cats evaluate in
    seconds (the round-1 per-element Python loops took minutes)."""
    import time
    rng = np.random.RandomState(0)
    gt_index = {}
    rows = []
    cats = [float(c) for c in range(1, 21)]
    for img in range(5000):
        for j in range(4):
            cat = float(rng.randint(1, 21))
            x, y = rng.rand(2) * 400
            w, h = rng.rand(2) * 60 + 20
            gt_index.setdefault((float(img), cat), []).append(
                (x, y, w, h, 0))
            # jittered det: IoU high but not 1.0
            rows.append((float(img), x + 2, y + 2, w, h,
                         float(rng.rand() * 0.5 + 0.5), cat))
    t0 = time.time()
    map05, map95 = evaluate_coco(rows, gt_index, cats)
    dt = time.time() - t0
    assert dt < 30.0, f"COCO eval too slow: {dt:.1f}s for 5k images"
    assert map05 > 0.9


def test_eval_solver_end_to_end_voc(tmp_path):
    """Fake eval step that emits GT boxes -> mAP 1.0 through the full
    solver path (rescaling, accumulation, file protocol)."""
    from odtpu.data import VOCDetection, SSDAugmentation, DetLoader
    from odtpu.eval import eval_solver_factory
    from odtpu.utils.config import default_cfg, update_cfg

    recs = make_voc(str(tmp_path / "VOCdevkit"), n_images=4, seed=5)
    ds = VOCDetection(str(tmp_path / "VOCdevkit"), (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=2, max_boxes=10, num_workers=1)
    cfg = default_cfg()
    update_cfg(cfg)
    solver = eval_solver_factory(loader, cfg, str(tmp_path / "out"))

    by_id = {r[0]: r for r in recs}
    order = [ds.ids[i][1] for i in range(len(ds))]
    sizes = {}
    for i in range(len(ds)):
        rec = ds[i]
        sizes[ds.ids[i][1]] = rec["extra"]

    call_count = {"n": 0}

    def fake_step(params, batch_stats, images):
        b = images.shape[0]
        out = np.zeros((b, 21, 200, 5), np.float32)
        for k in range(b):
            idx = call_count["n"] * 2 + k
            if idx >= len(order):
                continue
            img_id = order[idx]
            _, boxes, labels = by_id[img_id]
            h, w, _ = sizes[img_id]
            for j, (bb, l) in enumerate(zip(boxes, labels)):
                out[k, l + 1, j] = [0.9, bb[0] / w, bb[1] / h,
                                    bb[2] / w, bb[3] / h]
        call_count["n"] += 1
        return out

    res, (mAP,) = solver.validate(fake_step, params=None)
    assert mAP == pytest.approx(1.0, abs=1e-6)
    assert solver.last_timing["images"] == 4


def test_eval_solver_compact_dict_transport(tmp_path):
    """The compact {'rows', 'dropped'} eval-step contract: mAP identical
    to the dense path, dropped counter accumulated into last_timing."""
    from odtpu.data import VOCDetection, SSDAugmentation, DetLoader
    from odtpu.eval import eval_solver_factory
    from odtpu.utils.config import default_cfg, update_cfg

    recs = make_voc(str(tmp_path / "VOCdevkit"), n_images=4, seed=5)
    ds = VOCDetection(str(tmp_path / "VOCdevkit"), (("2007", "test"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=2, max_boxes=10, num_workers=1)
    cfg = default_cfg()
    update_cfg(cfg)
    solver = eval_solver_factory(loader, cfg, str(tmp_path / "out"))

    by_id = {r[0]: r for r in recs}
    order = [ds.ids[i][1] for i in range(len(ds))]
    sizes = {ds.ids[i][1]: ds[i]["extra"] for i in range(len(ds))}
    call_count = {"n": 0}

    def fake_step(params, batch_stats, images):
        b = images.shape[0]
        rows = np.zeros((b, 200, 6), np.float32)
        for k in range(b):
            idx = call_count["n"] * 2 + k
            if idx >= len(order):
                continue
            img_id = order[idx]
            _, boxes, labels = by_id[img_id]
            h, w, _ = sizes[img_id]
            for j, (bb, l) in enumerate(zip(boxes, labels)):
                rows[k, j] = [0.9, bb[0] / w, bb[1] / h,
                              bb[2] / w, bb[3] / h, l + 1]
        call_count["n"] += 1
        return {"rows": rows, "dropped": np.full((b,), 2, np.int32)}

    res, (mAP,) = solver.validate(fake_step, params=None)
    assert mAP == pytest.approx(1.0, abs=1e-6)
    # 2 per image x 4 valid images (padding rows excluded)
    assert solver.last_timing["dropped_dets"] == 8
