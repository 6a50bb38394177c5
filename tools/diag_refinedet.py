#!/usr/bin/env python
"""RefineDet two-stage health probe for a trained checkpoint.

Measures, on held-out batches, the quantities that explain an ODM that
fails to learn (the round-3 at-scale collapse was invisible in the loss
curve — this probe is the instrument the fix was derived with):

- ARM: positives/img vs the raw anchor grid, objectness accuracy on
  those positives, and P(bg)>thresh "ignore" rate overall.
- ODM: positives/img vs the ARM-refined anchors, argmax class accuracy
  on those positives, the ignore rate restricted to them, and the mean
  matched IoU of refined vs raw anchors (is the ARM actually improving
  localization?).

Usage:
  python tools/diag_refinedet.py weights/tests/refinedet_synth_r4 \
      [--batches 4] [--batch 8]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="run dir containing ckpt/ + config_used.yml")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from odtpu.data import dataset_factory
    from odtpu.models import model_factory
    from odtpu.ops.boxes import center_size, decode, jaccard, point_form
    from odtpu.ops.matching import match
    from odtpu.utils.checkpoint import restore_eval_variables
    from odtpu.utils.config import load_cfg

    cfg = load_cfg(osp.join(args.run_dir, "config_used.yml"))
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.EVAL_BATCH_SIZE = args.batch
    cfg.DATASET.NUM_WORKERS = 2
    cfg.DATASET.CACHE_IMAGES = False
    assert cfg.MODEL.SSD_TYPE == "RefineDet", cfg.MODEL.SSD_TYPE

    model, priors, _ = model_factory("train", cfg)
    variables = restore_eval_variables(model, cfg,
                                       osp.join(args.run_dir, "ckpt"),
                                       step=args.step)
    loader = dataset_factory("eval", cfg)

    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    overlap = float(cfg.LOSS.OVERLAP_THRESH)
    neg_anchor_thresh = 0.99
    pixel_means = tuple(float(m) for m in cfg.DATASET.PIXEL_MEANS)

    from odtpu.layers.losses import _XFORM_CLIP

    def diag(params, priors_arg, images, boxes, labels):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) \
                - jnp.asarray(pixel_means, jnp.float32)
            images = images[..., ::-1]
        arm_loc, arm_conf, odm_loc, odm_conf = model.apply(
            {"params": params}, images, phase="train", train=False)

        # ---- ARM side (vs raw anchor grid) ----
        bin_labels = jnp.where(labels >= 0, 0, -1)

        def match_one(b, l, pri):
            loc_t, conf_t, best_idx = match(b, l, pri, variances, overlap)
            return loc_t, conf_t, best_idx

        _, arm_t, _ = jax.vmap(
            lambda b, l: match_one(b, l, priors_arg))(boxes, bin_labels)
        arm_pos = arm_t > 0
        arm_prob = jax.nn.softmax(arm_conf, axis=-1)
        arm_hit = (arm_prob[..., 1] > 0.5) & arm_pos
        ignore = arm_prob[..., 0] > neg_anchor_thresh

        # ---- refined anchors + ODM matching (same math as the loss) ----
        clip = _XFORM_CLIP / float(variances[1])
        arm_loc_c = jnp.concatenate(
            [arm_loc[..., :2], jnp.clip(arm_loc[..., 2:], -clip, clip)], -1)
        refined = center_size(decode(arm_loc_c, priors_arg[None], variances))
        degenerate = jnp.asarray([-4.0, -4.0, 1e-3, 1e-3], refined.dtype)
        refined_m = jnp.where(ignore[..., None], degenerate, refined)
        _, odm_t, _ = jax.vmap(
            lambda b, l, pri: match_one(b, l, pri))(boxes, labels, refined_m)
        odm_t = jnp.where(ignore, 0, odm_t)
        odm_pos = odm_t > 0
        odm_hit = (jnp.argmax(odm_conf, -1) == odm_t) & odm_pos

        # matched IoU improvement: best-GT overlap per positive anchor
        def best_iou(b, l, pri):
            ov = jaccard(b, point_form(pri))  # [G, P]
            ov = jnp.where((l >= 0)[:, None], ov, 0.0)
            return ov.max(axis=0)  # [P]

        iou_raw = jax.vmap(
            lambda b, l: best_iou(b, l, priors_arg))(boxes, labels)
        iou_ref = jax.vmap(best_iou)(boxes, labels, refined_m)

        # final decoded ODM boxes: does the ODM *loc* branch learn from
        # the same TCB features the conf branch fails on?
        final = decode(odm_loc, refined_m, variances)

        def best_iou_boxes(b, l, bx):
            ov = jaccard(b, bx)
            ov = jnp.where((l >= 0)[:, None], ov, 0.0)
            return ov.max(axis=0)

        iou_fin = jax.vmap(best_iou_boxes)(boxes, labels, final)

        # failure-mode split: positives predicted background vs wrong
        # foreground class; and fg-only argmax accuracy (ignores the
        # bg logit entirely)
        am = jnp.argmax(odm_conf, -1)
        pred_bg = (am == 0) & odm_pos
        fg_am = 1 + jnp.argmax(odm_conf[..., 1:], -1)
        fg_hit = (fg_am == odm_t) & odm_pos
        n_gt = jnp.sum(labels >= 0)

        s = lambda x: jnp.sum(x.astype(jnp.float32))
        return {
            "imgs": jnp.asarray(images.shape[0], jnp.float32),
            "gt": s(labels >= 0),
            "arm_pos": s(arm_pos), "arm_hit": s(arm_hit),
            "ignored": s(ignore),
            "priors": jnp.asarray(arm_pos.size, jnp.float32),
            "odm_pos": s(odm_pos), "odm_hit": s(odm_hit),
            "odm_pred_bg": s(pred_bg), "odm_fg_hit": s(fg_hit),
            "odm_pos_ignored": s(odm_pos & ignore),
            "iou_raw_sum": s(jnp.where(odm_pos, iou_raw, 0.0)),
            "iou_ref_sum": s(jnp.where(odm_pos, iou_ref, 0.0)),
            "iou_fin_sum": s(jnp.where(odm_pos, iou_fin, 0.0)),
            # accuracy restricted to anchors that natively overlap GT
            # (ARM positives): if THESE classify fine, the problem is
            # label noise on far-but-refined anchors, not the features
            "narrow_pos": s(odm_pos & arm_pos),
            "narrow_hit": s(odm_hit & arm_pos),
        }

    jdiag = jax.jit(diag)
    priors_dev = jax.device_put(jnp.asarray(priors))
    acc = None
    for bi, batch in enumerate(loader):
        if bi >= args.batches:
            break
        out = jdiag(variables["params"], priors_dev, batch["images"],
                    batch["boxes"], batch["labels"][..., 0]
                    if batch["labels"].ndim == 3 else batch["labels"])
        out = {k: float(v) for k, v in out.items()}
        acc = out if acc is None else {k: acc[k] + out[k] for k in acc}

    n = acc["imgs"]
    print("== RefineDet probe: {} ({} imgs) ==".format(args.run_dir, int(n)))
    print("ARM pos/img             {:8.1f}".format(acc["arm_pos"] / n))
    print("ARM obj acc on pos      {:8.3f}".format(
        acc["arm_hit"] / max(acc["arm_pos"], 1)))
    print("ignore rate (P(bg)>.99) {:8.3f}".format(
        acc["ignored"] / acc["priors"]))
    print("ODM pos/img             {:8.1f}".format(acc["odm_pos"] / n))
    print("GT boxes/img            {:8.1f}".format(acc["gt"] / n))
    print("ODM cls acc on pos      {:8.3f}".format(
        acc["odm_hit"] / max(acc["odm_pos"], 1)))
    print("ODM pos pred-bg frac    {:8.3f}".format(
        acc["odm_pred_bg"] / max(acc["odm_pos"], 1)))
    print("ODM fg-only acc on pos  {:8.3f}".format(
        acc["odm_fg_hit"] / max(acc["odm_pos"], 1)))
    print("ODM pos ignored frac    {:8.3f}".format(
        acc["odm_pos_ignored"] / max(acc["odm_pos"], 1)))
    print("matched IoU raw->refined->final {:.3f} -> {:.3f} -> {:.3f}"
          .format(acc["iou_raw_sum"] / max(acc["odm_pos"], 1),
                  acc["iou_ref_sum"] / max(acc["odm_pos"], 1),
                  acc["iou_fin_sum"] / max(acc["odm_pos"], 1)))
    print("ODM acc on ARM-pos subset {:.3f} ({} anchors)".format(
        acc["narrow_hit"] / max(acc["narrow_pos"], 1),
        int(acc["narrow_pos"])))


if __name__ == "__main__":
    main()
