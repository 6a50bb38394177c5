"""Eval solvers: run the jitted eval step over a loader, collect mAP.

Parity target: /root/reference/lib/utils/evaluate_utils.py (EvalBase:14,
EvalVOC:115, EvalCOCO:165). Contract preserved:
- detector params top_k=200, conf_thresh=0.01, nms_thresh=0.45
  (evaluate_utils.py:16-17) via cfg.EVAL;
- boxes rescaled to original pixel size from the batch 'extra' field
  (evaluate_utils.py:64-69);
- VOC: results[cls][img] arrays -> file-protocol evaluation;
- COCO: [cocoid, x, y, w, h, score, cat] rows -> COCO bbox protocol;
  NUM_EVAL_PICS subsetting honored for COCO, rejected for VOC
  (evaluate_utils.py:119-120,168-169).

TPU-first: the whole decode+NMS runs inside the jitted step on device;
only the final [B, C, top_k, 5] tensor is copied to host. Short final
batches are padded to the fixed batch size so the step never recompiles.
"""

from __future__ import annotations

import os.path as osp
import time

import numpy as np

from ..data.loader import pad_batch_to
from .coco_eval import build_gt_index, evaluate_coco
from .voc_eval import evaluate_detections


class EvalBase:
    def __init__(self, data_loader, cfg, output_dir="eval_out"):
        self.loader = data_loader
        self.cfg = cfg
        self.output_dir = output_dir
        self.batch_size = data_loader.batch_size
        self.last_timing = {}

    def reset_results(self):
        raise NotImplementedError

    def accumulate(self, det, extra, ids, img_idx):
        raise NotImplementedError

    def evaluate_stats(self, tb_writer=None):
        raise NotImplementedError

    def validate(self, eval_step, params, batch_stats=None, tb_writer=None):
        """eval_step(params, batch_stats, images[B,H,W,3]) ->
        detections [B, C, top_k, 5] (score, x1, y1, x2, y2 normalized)."""
        self.reset_results()
        img_idx = 0
        t_detect = 0.0
        t0 = time.time()
        n_images = 0
        for batch in self.loader:
            batch, valid = pad_batch_to(batch, self.batch_size)
            t1 = time.time()
            det = eval_step(params, batch_stats, batch["images"])
            det = np.asarray(det)  # blocks
            t_detect += time.time() - t1
            det = det[:valid]
            # rescale normalized boxes to original pixel sizes
            h = batch["extra"][:valid, 0][:, None, None]
            w = batch["extra"][:valid, 1][:, None, None]
            det[:, :, :, 1] *= w
            det[:, :, :, 3] *= w
            det[:, :, :, 2] *= h
            det[:, :, :, 4] *= h
            img_idx = self.accumulate(det, batch["extra"][:valid],
                                      batch["ids"][:valid], img_idx)
            n_images += valid
        total = time.time() - t0
        self.last_timing = {"detect_s": t_detect, "total_s": total,
                            "images": n_images,
                            "ips": n_images / max(total, 1e-9)}
        return self.evaluate_stats(tb_writer)


class EvalVOC(EvalBase):
    def __init__(self, data_loader, cfg, output_dir="eval_out"):
        super().__init__(data_loader, cfg, output_dir)
        if cfg.DATASET.NUM_EVAL_PICS > 0:
            raise ValueError("NUM_EVAL_PICS subsetting not supported for "
                             "VOC (reference parity, evaluate_utils.py:119)")
        self.test_set = cfg.DATASET.TEST_SETS[0][1]
        self.num_classes = cfg.MODEL.NUM_CLASSES

    def reset_results(self):
        n = self.loader.num_items
        self.results = [[np.zeros((0, 5), np.float32) for _ in range(n)]
                        for _ in range(self.num_classes)]

    def accumulate(self, det, extra, ids, img_idx):
        # det [B, C, K, 5] = score, x1, y1, x2, y2 (pixels)
        for b in range(det.shape[0]):
            for cls in range(1, det.shape[1]):
                rows = det[b, cls]
                rows = rows[rows[:, 0] > 0]
                if rows.size == 0:
                    continue
                # -> x1, y1, x2, y2, score
                self.results[cls][img_idx] = np.ascontiguousarray(
                    rows[:, [1, 2, 3, 4, 0]], np.float32)
            img_idx += 1
        return img_idx

    def evaluate_stats(self, tb_writer=None):
        res, mAP = evaluate_detections(
            self.results, self.loader.dataset, self.output_dir,
            test_set=self.test_set,
            use_07_metric=bool(self.cfg.EVAL.USE_07_METRIC))
        if tb_writer is not None:
            tb_writer.add_pr_curves(res)
        return res, [mAP]


class EvalCOCO(EvalBase):
    def __init__(self, data_loader, cfg, output_dir="eval_out"):
        super().__init__(data_loader, cfg, output_dir)
        self.label_to_cat = data_loader.dataset.label_to_cat

    def reset_results(self):
        self.rows = []

    def accumulate(self, det, extra, ids, img_idx):
        for b in range(det.shape[0]):
            coco_id = float(ids[b])
            for cls in range(1, det.shape[1]):
                rows = det[b, cls]
                rows = rows[rows[:, 0] > 0]
                if rows.size == 0:
                    continue
                cat = float(self.label_to_cat[cls - 1])
                for r in rows:
                    self.rows.append((coco_id, r[1], r[2], r[3] - r[1],
                                      r[4] - r[2], r[0], cat))
            img_idx += 1
        return img_idx

    def evaluate_stats(self, tb_writer=None):
        gt_index = build_gt_index(self.loader.dataset)
        if self.loader.num_items < len(self.loader.dataset):
            keep_ids = {float(self.loader.dataset.items[i][1])
                        for i in range(self.loader.num_items)}
            gt_index = {k: v for k, v in gt_index.items()
                        if k[0] in keep_ids}
        cat_ids = sorted(self.label_to_cat.values())
        map05, map95 = evaluate_coco(self.rows, gt_index,
                                     [float(c) for c in cat_ids])
        return self.rows, [map05, map95]


def eval_solver_factory(loader, cfg, output_dir="eval_out"):
    """Mirror of /root/reference/lib/utils/__init__.py:8-11."""
    if cfg.DATASET.NAME.upper().startswith("COCO"):
        return EvalCOCO(loader, cfg, output_dir)
    return EvalVOC(loader, cfg, output_dir)
