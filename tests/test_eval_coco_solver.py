"""EvalCOCO solver end-to-end on a synthetic COCO tree with a perfect
fake detector, plus NUM_EVAL_PICS subsetting."""

import numpy as np
import pytest

from odtpu.data import COCODetection, DetLoader, SSDAugmentation
from odtpu.eval import eval_solver_factory
from odtpu.utils.config import default_cfg, update_cfg
from synth import make_coco


@pytest.fixture(scope="module")
def coco_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    recs = make_coco(str(root), n_images=6, seed=9)
    return str(root), recs


def _solver(root, num_pics=0, batch=3):
    cfg = default_cfg()
    cfg.DATASET.NAME = "COCO2014"
    cfg.DATASET.NUM_CLASSES = 80
    update_cfg(cfg)
    cfg.DATASET.NUM_EVAL_PICS = num_pics
    ds = COCODetection(root, (("2014", "val"),))
    t = SSDAugmentation((300, 300), use_base=True)
    loader = DetLoader(ds, t, batch_size=batch, max_boxes=10,
                       num_workers=1, num_pics=num_pics)
    return eval_solver_factory(loader, cfg), ds


def _perfect_step_factory(ds, order_ids, batch):
    """Emit every GT box (normalized) with score .9 as the detection."""
    by_id = {}
    for (path, img_id, (w, h), anns) in ds.items:
        rows = []
        for a in anns:
            x, y, bw, bh = a["bbox"]
            cls = ds.cat_to_label[a["category_id"]] + 1
            rows.append((x / w, y / h, (x + bw) / w, (y + bh) / h, cls))
        by_id[img_id] = rows
    call = {"n": 0}

    def step(params, batch_stats, images):
        b = images.shape[0]
        out = np.zeros((b, 200, 6), np.float32)
        for k in range(b):
            idx = call["n"] * batch + k
            if idx >= len(order_ids):
                continue
            for j, (x1, y1, x2, y2, cls) in enumerate(by_id[order_ids[idx]]):
                out[k, j] = (0.9, x1, y1, x2, y2, cls)
        call["n"] += 1
        return out

    return step


def test_coco_solver_perfect(coco_ws):
    root, _ = coco_ws
    solver, ds = _solver(root)
    order = [ds.items[i][1] for i in range(len(ds))]
    step = _perfect_step_factory(ds, order, 3)
    rows, (map05, map95) = solver.validate(step, params=None)
    assert map05 == pytest.approx(1.0)
    assert map95 == pytest.approx(1.0)


def test_coco_num_eval_pics(coco_ws):
    root, _ = coco_ws
    solver, ds = _solver(root, num_pics=3)
    order = [ds.items[i][1] for i in range(len(ds))]
    step = _perfect_step_factory(ds, order, 3)
    rows, (map05, _) = solver.validate(step, params=None)
    assert solver.last_timing["images"] == 3
    assert map05 == pytest.approx(1.0)


def test_visualize_utils(coco_ws, tmp_path):
    """draw/viz helpers run and produce plausible artifacts."""
    import numpy as np
    from odtpu.utils.logging import TBWriter
    from odtpu.utils.visualize import (anchor_match_stats, draw_boxes,
                                       viz_anchor_strategy, vis_img_box,
                                       viz_feature_maps)
    img = np.zeros((100, 100, 3), np.uint8)
    out = draw_boxes(img, [[10, 10, 50, 50]], [3], [0.7])
    assert out.sum() > 0  # something was drawn

    tb = TBWriter(str(tmp_path / "tb"))
    vis_img_box(img, {"gt": np.array([[10, 10, 50, 50, 2]]),
                      "pred": np.array([[0.8, 12, 12, 52, 52, 3]])}, tb)
    priors = np.array([[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1]],
                      np.float32)
    stats = anchor_match_stats(
        priors,
        np.array([[[0.3, 0.3, 0.7, 0.7]]], np.float32),
        np.array([[2]], np.int64))
    assert stats["matched_per_gt"].shape == (1,)
    assert stats["matched_per_gt"][0] >= 1
    viz_anchor_strategy(stats, tb)
    viz_feature_maps([np.random.rand(1, 8, 8, 4)], tb)
    tb.close()
    assert any((tmp_path / "tb").iterdir())
