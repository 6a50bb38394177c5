from .coco_eval import build_gt_index, evaluate_coco
from .evaluator import EvalBase, EvalCOCO, EvalVOC, eval_solver_factory
from .voc_eval import (eval_class, evaluate_detections, load_voc_gt,
                       parse_rec, voc_ap, write_results_files)

__all__ = [
    "build_gt_index", "evaluate_coco", "EvalBase", "EvalCOCO", "EvalVOC",
    "eval_solver_factory", "eval_class", "evaluate_detections",
    "load_voc_gt", "parse_rec", "voc_ap", "write_results_files",
]
