from .boxes import (area, center_size, decode, encode, intersect, iog,
                    jaccard, log_sum_exp, point_form)
from .detect import DetectOut, detect_out
from .matching import match, match_batch, match_second_best
from .nms import nms, nms_mask
from .priors import PRIOR_REGISTRY, PriorBoxSSD, prior_factory
from .topk import top_k_exact

__all__ = [
    "area", "center_size", "decode", "encode", "intersect", "iog", "jaccard",
    "log_sum_exp", "point_form", "DetectOut", "detect_out", "match",
    "match_batch", "match_second_best", "nms", "nms_mask", "PRIOR_REGISTRY",
    "PriorBoxSSD", "prior_factory", "top_k_exact",
]
