"""Detection output head: decode + per-class NMS, fully on-chip.

Parity target: /root/reference/lib/layers/functions/detection.py
(DetectOut:6). The reference loops Python over images and classes and
calls the while-loop NMS per class; here the whole post-process is one
jitted program: decode once per image, then vmap the fixed-shape NMS
over (batch x classes). Output contract is identical:

    output[b, c, k] = [score, x1, y1, x2, y2]   for c in 1..C-1

with rows zeroed beyond the per-class keep count, class 0 (background)
all zeros. Defaults mirror the eval solver's DetectOut construction
(evaluate_utils.py:16-17): top_k=200, conf_thresh=0.01, nms_thresh=0.45.

Note: the reference's final cross-class top-k filter (detection.py:60-63)
is a silent no-op — `flt[...].fill_(0)` mutates a gathered *copy*, so
every per-class survivor is returned. We reproduce that actual behavior
by default; `cross_class_topk=True` enables the evidently intended
global rank filter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import decode
from .nms import _greedy_mask

Array = jax.Array


def detect_out(loc: Array, conf: Array, priors: Array, variances,
               conf_thresh: float = 0.01, nms_thresh: float = 0.45,
               top_k: int = 200, cross_class_topk: bool = False,
               impl: str = "lax"):
    """Decode + per-class NMS for a batch.

    Args:
        loc:    [B, P, 4] location predictions.
        conf:   [B, P, C] class probabilities (already softmaxed).
        priors: [P, 4] center-size priors.
        variances: (v_center, v_size).
        impl: 'lax' (fixed-iteration fori_loop) or 'pallas' (fused kernel).
    Returns:
        [B, C, top_k, 5] float32: (score, x1, y1, x2, y2), zero padded.
    """
    variances = tuple(float(v) for v in variances)
    return _detect_out(loc, conf, priors, variances, float(conf_thresh),
                       float(nms_thresh), int(top_k), bool(cross_class_topk),
                       impl)


@partial(jax.jit, static_argnames=("variances", "conf_thresh", "nms_thresh",
                                   "top_k", "cross_class_topk", "impl"))
def _detect_out(loc, conf, priors, variances, conf_thresh, nms_thresh,
                top_k, cross_class_topk, impl):
    B, P, C = conf.shape
    decoded = decode(loc, priors[None], variances)  # [B, P, 4]

    if impl == "pallas":
        from .pallas.nms_kernel import per_class_nms_pallas
        out_fg = per_class_nms_pallas(
            decoded, conf[..., 1:], conf_thresh, nms_thresh, top_k)
    else:
        def one_class(boxes, scores):
            # [P,4], [P] -> [top_k, 5]
            k = min(top_k, P)
            top_scores, order = jax.lax.top_k(scores, k)
            top_boxes = jnp.take(boxes, order, axis=0)
            alive = _greedy_mask(top_boxes, top_scores, nms_thresh, conf_thresh)
            perm = jnp.argsort(~alive, stable=True)
            a = alive[perm].astype(top_scores.dtype)
            row_scores = jnp.take(top_scores, perm) * a
            row_boxes = jnp.take(top_boxes, perm, axis=0) * a[:, None]
            rows = jnp.concatenate([row_scores[:, None], row_boxes], axis=1)
            if k < top_k:
                rows = jnp.pad(rows, ((0, top_k - k), (0, 0)))
            return rows

        per_image = jax.vmap(one_class, in_axes=(None, 1))  # over classes
        out_fg = jax.vmap(per_image)(decoded, conf[..., 1:])  # [B, C-1, K, 5]

    background = jnp.zeros((B, 1, top_k, 5), out_fg.dtype)
    output = jnp.concatenate([background, out_fg], axis=1)  # [B, C, K, 5]

    if cross_class_topk:
        # the *intended* reference behavior: keep only the global top_k
        # detections per image across all classes (detection.py:60-63)
        flat = output.reshape(B, -1, 5)
        rank_src = jnp.argsort(-flat[:, :, 0], axis=1, stable=True)
        rank = jnp.argsort(rank_src, axis=1)
        keep = (rank < top_k)[..., None]
        output = jnp.where(keep, flat, 0.0).reshape(B, C, top_k, 5)
    return output


class DetectOut:
    """Callable wrapper mirroring the reference constructor signature
    (detection.py:12) for drop-in familiarity."""

    def __init__(self, num_classes, bkg_label, top_k, conf_thresh, nms_thresh,
                 variance, impl="lax"):
        if nms_thresh <= 0:
            raise ValueError("nms_threshold must be non negative.")
        del num_classes, bkg_label  # implied by conf's shape / fixed 0
        self.top_k = int(top_k)
        self.conf_thresh = float(conf_thresh)
        self.nms_thresh = float(nms_thresh)
        self.variance = tuple(float(v) for v in variance)
        self.impl = impl

    def __call__(self, loc, conf, priors):
        return detect_out(loc, conf, priors, self.variance,
                          conf_thresh=self.conf_thresh,
                          nms_thresh=self.nms_thresh,
                          top_k=self.top_k, impl=self.impl)
