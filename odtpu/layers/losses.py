"""Detection losses — vectorized, fixed-shape, differentiable end-to-end.

Parity targets:
- MultiBoxLoss: /root/reference/lib/layers/modules/multibox_loss.py:10
  (per-image CPU matching loop + gather-based mined CE). Here: matching
  is vmapped (odtpu.ops.matching) and hard-negative mining keeps the
  reference's double-argsort rank trick (multibox_loss.py:99-103) —
  already fixed-shape — while the variable-length (pos+neg) gather
  becomes a masked sum, which is numerically identical.
- FocalLoss: lib/layers/modules/focal_loss.py:6 (vendored, unused there;
  exported here as a working alternative).
- RepulsionLoss (RepGT): lib/layers/modules/repulsion_loss.py:10. The
  reference's smoothln adds term1 where term2 is intended (line 49); we
  implement the *correct* SmoothLn from the Repulsion Loss paper.

All losses return unnormalized sums plus the positive count so the train
step can normalize by the *global* N under data parallelism (the
reference normalizes by the per-process batch N, multibox_loss.py:114).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import decode, iog
from ..ops.matching import match_batch, match_second_best

Array = jax.Array

# max |loc_size * variance| admitted into exp() when a decode consumes
# raw network outputs (RefineDet's two-step paths): log(1000/16), the
# standard Detectron BBOX_XFORM_CLIP. See refinedet_loss for why.
_XFORM_CLIP = 4.135166556742356


class MultiBoxLossOutput(NamedTuple):
    loss_loc_sum: Array   # scalar, unnormalized smooth-L1 over positives
    loss_conf_sum: Array  # scalar, unnormalized mined CE
    num_pos: Array        # scalar int, total positives in this shard


def smooth_l1(x: Array) -> Array:
    """Elementwise smooth-L1 (beta=1), summed by callers."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_targets(gt_boxes: Array, gt_labels: Array, priors: Array,
                     variances, overlap_thresh: float):
    """Batched matching: [B,G,4],[B,G] -> (loc_t [B,P,4], conf_t [B,P])."""
    loc_t, conf_t, _ = match_batch(gt_boxes, gt_labels, priors, variances,
                                   overlap_thresh)
    return jax.lax.stop_gradient(loc_t), jax.lax.stop_gradient(conf_t)


def multibox_loss(loc_pred: Array, conf_pred: Array, priors: Array,
                  gt_boxes: Array, gt_labels: Array, variances,
                  overlap_thresh: float = 0.5, neg_pos_ratio: int = 3,
                  ) -> MultiBoxLossOutput:
    """SSD weighted loss (loc smooth-L1 + mined softmax CE), unnormalized.

    Args:
        loc_pred:  [B, P, 4] raw loc predictions.
        conf_pred: [B, P, C] raw class logits.
        priors:    [P, 4] center-size priors.
        gt_boxes:  [B, G, 4] point-form GT, padded.
        gt_labels: [B, G] labels in [0, C-2]; < 0 marks padding.
    """
    loc_t, conf_t = multibox_targets(gt_boxes, gt_labels, priors, variances,
                                     overlap_thresh)
    return mined_multibox(loc_pred, conf_pred, loc_t, conf_t, neg_pos_ratio)


def mined_multibox(loc_pred: Array, conf_pred: Array, loc_t: Array,
                   conf_t: Array, neg_pos_ratio: int = 3,
                   ignore: Array | None = None) -> MultiBoxLossOutput:
    """Smooth-L1 + hard-negative-mined CE from precomputed targets.

    ignore: optional [B, P] bool — priors excluded from the NEGATIVE
    mining pool only (RefineDet's negative anchor filtering, paper
    §3.1 filters "well-classified negative anchors"). Positives always
    train: an earlier version also dropped ignored positives, and a
    from-scratch ARM — bg-overconfident on 52% of the ODM's positive
    anchors by iter 6k (measured, BENCH_NOTES round-3) — starved the
    ODM to a 0.08-mAP plateau.
    """
    B, P, C = conf_pred.shape
    pos = conf_t > 0  # [B, P]
    num_pos = pos.sum(axis=1)  # [B]

    # ---- localization: smooth-L1 over positive priors -------------------
    loc_err = smooth_l1(loc_pred.astype(jnp.float32) - loc_t)
    loss_l = jnp.sum(jnp.where(pos[..., None], loc_err, 0.0))

    # ---- per-prior softmax CE (= logsumexp - logit[target]) -------------
    logits = conf_pred.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)  # [B, P]
    tgt = jnp.where(pos, conf_t, 0)
    # one-hot reduce instead of take_along_axis: the class-axis gather
    # costs 4.5 ms standalone at [32, 8732, 21] (and its backward is a
    # scatter); the masked reduce is 1.2 ms and its backward is a
    # broadcast multiply. Exact: sums the target logit plus C-1 true
    # zeros in f32.
    picked = jnp.sum(logits * jax.nn.one_hot(tgt, C, dtype=logits.dtype),
                     axis=-1)
    ce = lse - picked  # [B, P]

    # ---- hard negative mining (double-argsort rank trick) ---------------
    excluded = pos if ignore is None else (pos | ignore)
    ce_neg = jnp.where(excluded, 0.0, ce)
    loss_idx = jnp.argsort(-ce_neg, axis=1, stable=True)
    rank = jnp.argsort(loss_idx, axis=1)
    num_neg = jnp.clip(neg_pos_ratio * num_pos, max=P - 1)  # [B]
    neg = (rank < num_neg[:, None]) & ~excluded  # [B, P]

    loss_c = jnp.sum(jnp.where(pos | neg, ce, 0.0))
    return MultiBoxLossOutput(loss_l, loss_c, num_pos.sum())


class MultiBoxLoss:
    """Convenience wrapper with the reference's call contract:
    loss = MultiBoxLoss(cfg)((loc, conf, priors), (boxes, labels))
    returns (loss_l, loss_c) each already / N (total positives)."""

    def __init__(self, cfg):
        self.variance = tuple(cfg.MODEL.VARIANCE)
        self.threshold = float(cfg.LOSS.OVERLAP_THRESH)
        self.negpos_ratio = int(cfg.LOSS.NEG_POS_RATIO)

    def __call__(self, predictions, targets):
        loc, conf, priors = predictions
        boxes, labels = targets
        out = multibox_loss(loc, conf, priors, boxes, labels, self.variance,
                            self.threshold, self.negpos_ratio)
        n = jnp.maximum(out.num_pos, 1).astype(jnp.float32)
        return out.loss_loc_sum / n, out.loss_conf_sum / n


class RefineDetLossOutput(NamedTuple):
    arm: MultiBoxLossOutput
    odm: MultiBoxLossOutput


def refinedet_loss(arm_loc: Array, arm_conf: Array, odm_loc: Array,
                   odm_conf: Array, priors: Array, gt_boxes: Array,
                   gt_labels: Array, variances,
                   overlap_thresh: float = 0.5, neg_pos_ratio: int = 3,
                   neg_anchor_thresh: float = 0.99,
                   use_refined=True) -> RefineDetLossOutput:
    """Two-stage RefineDet loss (arXiv:1711.06897 §3).

    ARM: class-agnostic multibox loss against the anchor grid (every GT
    label collapsed to one 'object' class).
    ODM: C-class multibox loss against the ARM-*refined* anchors
    (decode(arm_loc) as per-image priors, gradients stopped), with
    anchors the ARM confidently calls background (P(bg) > 0.99) removed
    from the negative mining pool (paper's negative anchor filtering;
    positives always train — see mined_multibox).

    use_refined (bool scalar, may be traced): when False the ODM matches
    GT against the RAW anchor grid with no negative-anchor filtering —
    i.e. behaves as a plain SSD multibox loss. From-scratch training
    needs a warm phase in this mode (cfg.LOSS.ODM_MATCH_WARM_ITERS):
    before the ARM converges, refined anchors are random-init offsets,
    the ODM class targets they induce are pure label noise, and the
    conf head collapses toward uniform and never recovers (measured:
    iter-6k ODM positive-class accuracy 0.112 while a fresh linear
    probe on the SAME TCB features scores 0.845 held-out —
    tools/diag_refinedet.py, tools/probe_tcb_features.py). The paper
    never hits this because its backbone is pretrained and the ARM is
    meaningful within hundreds of iters.
    """
    from ..ops.boxes import center_size, decode
    from ..ops.matching import match

    # ---- ARM: binary objectness ------------------------------------
    bin_labels = jnp.where(gt_labels >= 0, 0, -1)
    arm_out = multibox_loss(arm_loc, arm_conf, priors, gt_boxes, bin_labels,
                            variances, overlap_thresh, neg_pos_ratio)

    # ---- refined anchors (per image) --------------------------------
    # Clamp the size term before exp (Detectron's BBOX_XFORM_CLIP =
    # log(1000/16)): RefineDet is the one family whose LOSS decodes raw
    # network outputs, and a from-scratch net at raw-pixel input scale
    # emits |arm_loc| ~ 1e3 at init (measured 844), so exp(loc*v)
    # overflows to inf anchors whose -inf encode targets can enter the
    # ODM loss through a forced match and NaN the run from step 1 (the
    # unclamped round-3 run, BENCH_NOTES). Inactive for any plausibly
    # trained network: allows anchors 62x their prior at v_size=0.2.
    clip = _XFORM_CLIP / float(variances[1])
    arm_loc_dec = jnp.concatenate(
        [arm_loc[..., :2], jnp.clip(arm_loc[..., 2:], -clip, clip)], -1)
    refined = center_size(decode(arm_loc_dec, priors[None], variances))
    refined = jax.lax.stop_gradient(refined)  # [B, P, 4]

    # negative-anchor filtering: ARM softmax background prob > thresh
    arm_prob_bg = jax.nn.softmax(
        jax.lax.stop_gradient(arm_conf.astype(jnp.float32)), axis=-1)[..., 0]
    ignore = arm_prob_bg > neg_anchor_thresh

    # Ignored anchors are excluded from ODM *matching*, not just the
    # loss: arm_loc on negative anchors never receives gradient (loc
    # loss is positives-only), so their refined boxes are frozen
    # random-init offsets — boxes anywhere in the image that overlap a
    # GT by luck. Left in the match, they (a) become "positives" whose
    # TCB receptive field sees background (unlearnable label noise —
    # 52% of all ODM positives on the first at-scale run, ODM argmax
    # accuracy 12.5% after 6k iters) and (b) STEAL GTs from genuine
    # anchors in the forced-bipartite step, leaving the GT with no
    # learnable positive at all. Degenerating their boxes (far outside
    # [0,1], IoU 0 with everything) keeps matching among anchors the
    # ARM itself considers object-like, which is also exactly the set
    # detect_refine scores at eval.
    degenerate = jnp.asarray([-4.0, -4.0, 1e-3, 1e-3], refined.dtype)
    refined_m = jnp.where(ignore[..., None], degenerate, refined)

    # warm phase: raw anchor grid, nothing filtered (plain SSD targets)
    use_ref = jnp.asarray(use_refined, bool)
    raw = jnp.broadcast_to(priors[None].astype(refined_m.dtype),
                           refined_m.shape)
    refined_m = jnp.where(use_ref, refined_m, raw)
    ignore = jnp.logical_and(ignore, use_ref)

    def match_one(boxes, labels, pri):
        loc_t, conf_t, _ = match(boxes, labels, pri, variances,
                                 overlap_thresh)
        return loc_t, conf_t

    loc_t, conf_t = jax.vmap(match_one)(gt_boxes, gt_labels, refined_m)
    # the forced-bipartite step can still pin a GT to a degenerate
    # anchor when NO live anchor overlaps it (argmax over an all-zero
    # row); those are not learnable either — background them
    conf_t = jnp.where(ignore, 0, conf_t)
    loc_t = jax.lax.stop_gradient(loc_t)
    conf_t = jax.lax.stop_gradient(conf_t)

    odm_out = mined_multibox(odm_loc, odm_conf, loc_t, conf_t,
                             neg_pos_ratio, ignore=ignore)
    return RefineDetLossOutput(arm_out, odm_out)


def focal_loss(conf_pred: Array, conf_t: Array, gamma: float = 2.0,
               alpha: float = 0.25) -> Array:
    """Focal loss over all priors (alternative to hard-negative mining).

    conf_pred: [B, P, C] logits; conf_t: [B, P] int targets (0=background).
    Returns the unnormalized sum.
    """
    logp = jax.nn.log_softmax(conf_pred.astype(jnp.float32), axis=-1)
    # one-hot reduce over the class axis (see mined_multibox): exact,
    # and avoids the gather + backward-scatter.
    logpt = jnp.sum(
        logp * jax.nn.one_hot(conf_t, logp.shape[-1], dtype=logp.dtype),
        axis=-1)
    pt = jnp.exp(logpt)
    at = jnp.where(conf_t > 0, alpha, 1.0 - alpha)
    return jnp.sum(-at * (1.0 - pt) ** gamma * logpt)


def _smooth_ln(x: Array, sigma: float = 0.5) -> Array:
    """SmoothLn penalty from the Repulsion Loss paper (CVPR'18 eq. 4):
    -ln(1-x) for x <= sigma, else (x-sigma)/(1-sigma) - ln(1-sigma).
    (The reference's version mistakenly doubles term1, repulsion_loss.py:49.)
    """
    x = jnp.clip(x, 0.0, 1.0 - 1e-6)
    lo = -jnp.log1p(-x)
    hi = (x - sigma) / (1.0 - sigma) - jnp.log1p(-sigma)
    return jnp.where(x <= sigma, lo, hi)


def repulsion_loss(loc_pred: Array, priors: Array, gt_boxes: Array,
                   gt_labels: Array, variances, sigma: float = 0.5):
    """RepGT term: push each positive prediction away from its second-best
    (non-assigned) ground truth. Returns (sum, count) for global averaging.
    Reference: repulsion_loss.py:10-50 via match_rep (box_utils.py:135).
    """
    def per_image(loc_p, boxes, labels):
        from ..ops.matching import match  # local to avoid cycle
        _, conf_t, best_idx = match(boxes, labels, priors, variances, 0.5)
        second, has_second = match_second_best(loc_p, boxes, labels, priors,
                                               variances, best_idx)
        decoded = decode(loc_p, priors, variances)
        overlap = iog(second, decoded)  # [P]
        pos = (conf_t > 0) & has_second
        pen = _smooth_ln(overlap, sigma)
        return jnp.sum(jnp.where(pos, pen, 0.0)), pos.sum()

    sums, counts = jax.vmap(per_image)(loc_pred, gt_boxes, gt_labels)
    return sums.sum(), counts.sum()
