"""Fixed-shape greedy NMS for TPU.

Parity target: /root/reference/lib/layers/box_utils.py `nms:279` — a
Python while-loop over a dynamically shrinking index tensor. That shape
-dynamic control flow cannot compile to TPU; this module restates greedy
NMS as a fixed-iteration program:

  1. take the top_k candidates by score (the reference also truncates to
     top_k before suppression, box_utils.py:301),
  2. build the [K, K] IoU matrix once (VPU-friendly, one shot),
  3. run K sequential mask updates (lax.fori_loop): when candidate i is
     still alive, kill every lower-scored candidate with IoU > thresh.

The result is bit-identical keep decisions to the reference's greedy
loop (same order, same IoU formula including its unclipped-area union),
but batched and jit/vmap-compatible. See odtpu/ops/pallas/nms_kernel.py
for the fused Pallas version used on the hot eval path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from odtpu.ops.topk import top_k_exact

Array = jax.Array


def _iou_matrix(boxes: Array) -> Array:
    """[K, 4] point-form -> [K, K] IoU with the reference's union formula
    (areas unclipped; intersection clipped at 0; box_utils.py:298-340)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.clip(xx2 - xx1, 0.0)
    h = jnp.clip(yy2 - yy1, 0.0)
    inter = w * h
    union = areas[:, None] + areas[None, :] - inter
    return inter / union


def nms_rows(boxes: Array, scores: Array, iou_thresh: float,
             top_k: int, score_thresh: float = 0.0):
    """Greedy NMS -> packed rows.

    [N,4],[N] -> ([top_k, 5] rows (score, x1, y1, x2, y2), descending
    score, zero-padded; count of kept boxes). Shared core of nms() and
    the detect path's per-class NMS."""
    n = scores.shape[0]
    k = min(top_k, n)
    top_scores, order = top_k_exact(scores, k)
    top_boxes = jnp.take(boxes, order, axis=0)
    alive = _greedy_mask(top_boxes, top_scores, iou_thresh, score_thresh)
    # compact kept candidates to the front, preserving score order
    perm = jnp.argsort(~alive, stable=True)
    a = alive[perm].astype(top_scores.dtype)
    row_scores = jnp.take(top_scores, perm) * a
    row_boxes = jnp.take(top_boxes, perm, axis=0) * a[:, None]
    rows = jnp.concatenate([row_scores[:, None], row_boxes], axis=1)
    if k < top_k:
        rows = jnp.pad(rows, ((0, top_k - k), (0, 0)))
    return rows, alive.sum().astype(jnp.int32)


@partial(jax.jit, static_argnames=("top_k",))
def nms(boxes: Array, scores: Array, iou_thresh: float, top_k: int = 200,
        score_thresh: float = 0.0):
    """Greedy NMS over one set of boxes.

    Args:
        boxes:  [N, 4] point-form boxes.
        scores: [N] scores; entries <= score_thresh never enter NMS.
        iou_thresh: suppression threshold (reference default 0.45).
        top_k: fixed output size.
    Returns:
        keep_boxes:  [top_k, 4] kept boxes, descending score, zero-padded.
        keep_scores: [top_k] kept scores, zero-padded.
        count: int32 number of kept boxes.
    """
    rows, count = nms_rows(boxes, scores, iou_thresh, top_k, score_thresh)
    return rows[:, 1:], rows[:, 0], count


def _greedy_mask(top_boxes: Array, top_scores: Array, iou_thresh: float,
                 score_thresh: float) -> Array:
    """[K] alive mask after greedy suppression of score-sorted candidates."""
    k = top_scores.shape[0]
    iou = _iou_matrix(top_boxes)
    later = jnp.arange(k)[None, :] > jnp.arange(k)[:, None]  # j after i

    alive0 = top_scores > score_thresh

    def body(i, alive):
        kill = alive[i] & (iou[i] > iou_thresh) & later[i]
        return alive & ~kill

    return jax.lax.fori_loop(0, k, body, alive0)


def nms_mask(boxes: Array, scores: Array, iou_thresh: float,
             score_thresh: float = 0.0) -> Array:
    """Greedy-NMS survival mask without top-k truncation/compaction.

    Candidates are ranked by score; returns [N] bool alive mask aligned
    with the inputs. Building block for the batched detect path.
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores, stable=True)
    top_boxes = jnp.take(boxes, order, axis=0)
    top_scores = jnp.take(scores, order)
    alive_sorted = _greedy_mask(top_boxes, top_scores, iou_thresh, score_thresh)
    inv = jnp.zeros(n, dtype=jnp.int32).at[order].set(jnp.arange(n))
    return alive_sorted[inv]
