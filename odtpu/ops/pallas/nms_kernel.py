"""Fused greedy-NMS Pallas kernel.

One grid step handles one (image, class) candidate set: the [K, K] IoU
matrix is built and consumed entirely in VMEM (the lax fallback
materializes it in HBM per pair — ~100 MB of round-trip traffic for a
B=32, C=21, K=200 eval batch), then the K-step greedy suppression runs
as an in-kernel fori_loop over VMEM vectors.

Semantics identical to odtpu.ops.nms._greedy_mask (which matches the
reference while-loop, lib/layers/box_utils.py:279): candidates arrive
score-sorted descending; candidate i, if still alive, kills every later
candidate with IoU > threshold; entries with score <= score_thresh are
dead on arrival. Union uses the reference's unclipped-area formula.

Layout: K is padded to a multiple of 128 lanes; boxes ride as four
separate [N, K] planes (x1, y1, x2, y2) so every in-kernel tensor is
lane-aligned.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odtpu.ops.topk import top_k_exact


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# candidate sets processed per grid step (sublane alignment wants
# multiples of 8). The grid executes sequentially on the core and the
# K-step greedy fori_loop dominates each step, so TOTAL time scales
# with (num_sets / _ROWS) * K sequential iterations: wider rows divide
# the sequential work. R=16 was the round-2 ceiling only because the
# default 16 MB *scoped* VMEM stack limit rejected the R=32 program by
# 2.79 MB (measured); raising vmem_limit_bytes (below) admits R=32 —
# the bf16 kill matrix [32,256,256] is 4 MB and the f32 broadcast
# intermediates Mosaic materializes (inter/union) put the true stack
# peak at ~19 MB, comfortably inside the 64 MB granted.
_ROWS = 32

# scoped-VMEM stack budget for the kernel (v5e has 128 MB VMEM; the
# 16 MB default exists to catch runaway kernels, not as hardware).
_VMEM_LIMIT = 64 * 1024 * 1024

# candidates whose kill rows are fetched per fori step (one batched MXU
# contraction) and then applied as dependent VPU sub-steps. Tail-chunk
# sub-steps with index >= k are identity updates because alive0's
# `col < k` term keeps those (lane-padded) candidates dead, so their
# alive_i reads are 0 — the one-hots themselves ARE nonzero for
# k <= index < Kp; do not drop the col<k mask.
_CHUNK = 8


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, alive_ref,
                *, iou_thresh: float, score_thresh: float, k: int):
    x1 = x1_ref[:, :]  # [R, K] — R independent candidate sets
    y1 = y1_ref[:, :]
    x2 = x2_ref[:, :]
    y2 = y2_ref[:, :]
    scores = scores_ref[:, :]
    R, K = x1.shape

    area = (x2 - x1) * (y2 - y1)  # [R, K]
    xx1 = jnp.maximum(x1[:, :, None], x1[:, None, :])  # [R, K, K]
    yy1 = jnp.maximum(y1[:, :, None], y1[:, None, :])
    xx2 = jnp.minimum(x2[:, :, None], x2[:, None, :])
    yy2 = jnp.minimum(y2[:, :, None], y2[:, None, :])
    w = jnp.maximum(xx2 - xx1, 0.0)
    h = jnp.maximum(yy2 - yy1, 0.0)
    inter = w * h
    union = area[:, :, None] + area[:, None, :] - inter

    col = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    alive0 = (scores > score_thresh) & (col < k)

    later = col[:, None, :] > col[:, :, None]  # [R, K, K]
    # iou > thresh restated division-free as inter > thresh*union
    # (& union > 0): same decisions for every reachable input —
    # inter > 0 implies both boxes are non-degenerate hence union > 0,
    # and zero-padded rows give inter = 0 = never kill. Avoiding the
    # f32 iou tensor (and the divide) roughly halves the step's live
    # VMEM (see _ROWS above for what still bounds it). Caveat: the two
    # forms round once each (multiply here, divide in ops/nms.py:45),
    # so a pair within 1 ulp of the threshold could in principle
    # decide differently; hardware parity sweeps at S=1..640 found no
    # such pair, and eval thresholds (0.45) are nowhere near ulp-scale.
    kill_mat = ((inter > iou_thresh * union) & (union > 0.0)
                & later).astype(jnp.bfloat16)

    # Greedy suppression without ANY dynamic indexing (Mosaic forbids
    # lane-dynamic reads): kill-matrix rows are extracted via one-hot
    # MXU contractions. The sequential chain is latency-bound on the
    # per-iteration dot, so _CHUNK rows are pulled in ONE batched dot
    # per fori step and consumed by _CHUNK cheap dependent VPU
    # sub-steps — measured 1.8x over one dot per candidate.
    T = _CHUNK
    n_chunks = (k + T - 1) // T

    def body(c, alive):  # alive: [R, K] float 0/1
        base = c * T
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (R, T, K), 1)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (R, T, K), 2)
        onehot_t = (col3 == base + t_idx).astype(jnp.bfloat16)
        # kills_t[r, t, j] = kill_mat[r, base+t, j]
        kills_t = jax.lax.dot_general(
            onehot_t, kill_mat,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [R, T, K]
        for t in range(T):
            onehot = (col == base + t).astype(jnp.float32)  # [R, K]
            alive_i = jnp.sum(alive * onehot, axis=1, keepdims=True)
            alive = alive * (1.0 - kills_t[:, t, :] * alive_i)
        return alive

    # output stays f32: an 8-bit (bool/int8) output block of (8, K) rows
    # violates the int8 (32, 128) min-tile; f32 tiles at (8, 128)
    alive = jax.lax.fori_loop(0, n_chunks, body,
                              alive0.astype(jnp.float32))
    alive_ref[:, :] = alive


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh"))
def nms_mask_pallas(boxes: jax.Array, scores: jax.Array,
                    iou_thresh: float, score_thresh: float = 0.0):
    """Batched greedy-NMS alive mask.

    Args:
        boxes:  [N, K, 4] score-sorted (descending) point-form candidates.
        scores: [N, K] matching scores.
    Returns:
        [N, K] bool alive mask.
    """
    N, K, _ = boxes.shape
    Kp = _round_up(K, 128)
    Np = _round_up(N, _ROWS)
    if Kp - K or Np - N:
        boxes = jnp.pad(boxes, ((0, Np - N), (0, Kp - K), (0, 0)))
        scores = jnp.pad(scores, ((0, Np - N), (0, Kp - K)))

    planes = [boxes[:, :, i] for i in range(4)]  # x1, y1, x2, y2 [Np, Kp]

    spec = pl.BlockSpec((_ROWS, Kp), lambda n: (n, 0),
                        memory_space=pltpu.VMEM)
    alive = pl.pallas_call(
        partial(_nms_kernel, iou_thresh=float(iou_thresh),
                score_thresh=float(score_thresh), k=K),
        out_shape=jax.ShapeDtypeStruct((Np, Kp), jnp.float32),
        grid=(Np // _ROWS,),
        in_specs=[spec] * 5,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(*planes, scores)
    return alive[:N, :K] > 0.5


def per_class_nms_pallas(decoded: jax.Array, conf_fg: jax.Array,
                         conf_thresh: float, nms_thresh: float,
                         top_k: int, compact_rows: bool = True):
    """Drop-in for odtpu.ops.detect._per_class_nms with impl='pallas'.

    decoded [B,P,4], conf_fg [B,P,C-1] -> [B, C-1, top_k, 5].

    compact_rows=False skips the survivors-first in-class compaction:
    rows stay in candidate (score-sorted pre-NMS) order with dead rows'
    scores zeroed but their boxes left as-is. Only valid for consumers
    that re-rank and mask by the score column (detect_out_compact's
    cross-class top-k does both) — the dense detect_out contract
    requires the compaction."""
    B, P, _ = decoded.shape
    Cf = conf_fg.shape[-1]
    k = min(top_k, P)

    scores_bc = jnp.moveaxis(conf_fg, -1, 1).reshape(B * Cf, P)
    top_scores, order = top_k_exact(scores_bc, k)  # [N, k]
    # gather candidate boxes per IMAGE (operand [B, P, 4]) rather than
    # per (image, class) set from a [B*Cf, P, 4] broadcast — same
    # elements fetched, ~Cf× smaller gather operand (measured 3.9 ms →
    # see BENCH_NOTES round-3 detect-tail table)
    top_boxes = jnp.take_along_axis(
        decoded, order.reshape(B, Cf * k)[..., None], axis=1)
    top_boxes = top_boxes.reshape(B * Cf, k, 4)

    alive = nms_mask_pallas(top_boxes, top_scores, nms_thresh, conf_thresh)

    # survivors-first compaction. Candidates are score-sorted and
    # softmax scores are non-negative, so top_k over alive-masked
    # scores IS the stable partition the contract wants: survivors in
    # their original descending order, then zeroed rows (value ties
    # resolve by smaller index, preserving original order for equal
    # scores and for the dead zeros) — one top_k + one 5-wide row
    # gather instead of a stable argsort + three separate gathers.
    masked = top_scores * alive
    if compact_rows:
        row_scores, perm = jax.lax.top_k(masked, k)
        rows5 = jnp.concatenate([masked[..., None], top_boxes], axis=-1)
        rows = jnp.take_along_axis(rows5, perm[..., None], axis=1)
        rows *= (row_scores > 0.0)[..., None]  # zero boxes of dead rows
    else:
        rows = jnp.concatenate([masked[..., None], top_boxes], axis=-1)
    if k < top_k:
        rows = jnp.pad(rows, ((0, 0), (0, top_k - k), (0, 0)))
    return rows.reshape(B, Cf, top_k, 5)
