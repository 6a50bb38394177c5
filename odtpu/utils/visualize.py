"""Visualization utilities for TensorBoard.

Parity target: /root/reference/lib/utils/visualize_utils.py —
box-overlay images (draw_bbox:16, vis_img_box:42), anchor-matching
statistics histograms (viz_archor_strategy:238), feature-map heatmaps
(viz_feature_maps:135). No temp-JPEG roundtrip (reference quirk at
visualize_utils.py:52-53): images go to TB as arrays directly.
"""

from __future__ import annotations

import numpy as np


def draw_boxes(image, boxes, labels=None, scores=None, color=(0, 255, 0),
               class_names=None):
    """Draw point-form pixel boxes on a uint8 BGR image copy."""
    import cv2
    img = np.ascontiguousarray(image).astype(np.uint8).copy()
    h, w = img.shape[:2]
    boxes = np.asarray(boxes).reshape(-1, 4)
    for i, b in enumerate(boxes):
        p1 = (int(np.clip(b[0], 0, w - 1)), int(np.clip(b[1], 0, h - 1)))
        p2 = (int(np.clip(b[2], 0, w - 1)), int(np.clip(b[3], 0, h - 1)))
        cv2.rectangle(img, p1, p2, color, 2)
        text = ""
        if labels is not None:
            li = int(np.asarray(labels).reshape(-1)[i])
            text = class_names[li] if class_names else str(li)
        if scores is not None:
            text += " {:.2f}".format(float(np.asarray(scores).reshape(-1)[i]))
        if text:
            cv2.putText(img, text, (p1[0], max(p1[1] - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)
    return img


def vis_img_box(image, boxes_dict, tb_writer, tag="detect", step=0,
                class_names=None):
    """Log an image with 'gt' (red) and/or 'pred' (green) boxes.

    boxes_dict: {'gt': [N,5] (box+label), 'pred': [M,6] (score,box,cls)}.
    """
    img = np.ascontiguousarray(image).astype(np.uint8)
    if "gt" in boxes_dict and len(boxes_dict["gt"]):
        gt = np.asarray(boxes_dict["gt"])
        img = draw_boxes(img, gt[:, :4], gt[:, 4].astype(int),
                         color=(0, 0, 255), class_names=class_names)
    if "pred" in boxes_dict and len(boxes_dict["pred"]):
        pr = np.asarray(boxes_dict["pred"])
        img = draw_boxes(img, pr[:, 1:5], pr[:, 5].astype(int), pr[:, 0],
                         color=(0, 255, 0), class_names=class_names)
    tb_writer.add_image(tag, img[:, :, ::-1], step)  # BGR -> RGB for TB


def anchor_match_stats(priors, gt_boxes, gt_labels, variances=(0.1, 0.2),
                       threshold=0.5):
    """Anchor-coverage statistics over a set of padded GT batches.

    Returns dict of numpy arrays: matched counts per GT, per-anchor best
    IoU, matched anchor w/h/ar — the data behind the reference's
    viz_archor_strategy histograms (visualize_utils.py:238-345).
    """
    import jax.numpy as jnp
    from ..ops.boxes import jaccard, point_form
    from ..ops.matching import match

    priors = jnp.asarray(priors)
    stats = {"gt_w": [], "gt_h": [], "matched_per_gt": [],
             "best_iou_per_gt": [], "anchor_w": [], "anchor_h": []}
    for boxes, labels in zip(gt_boxes, gt_labels):
        valid = labels >= 0
        if not np.any(valid):
            continue
        b = jnp.asarray(boxes)
        overlaps = np.asarray(jaccard(b, point_form(priors)))
        _, conf_t, best_idx = match(b, jnp.asarray(labels), priors,
                                    variances, threshold)
        conf_t = np.asarray(conf_t)
        best_idx = np.asarray(best_idx)
        for gi in np.nonzero(np.asarray(valid))[0]:
            sel = (best_idx == gi) & (conf_t > 0)
            stats["matched_per_gt"].append(int(sel.sum()))
            stats["best_iou_per_gt"].append(float(overlaps[gi].max()))
            stats["gt_w"].append(float(boxes[gi, 2] - boxes[gi, 0]))
            stats["gt_h"].append(float(boxes[gi, 3] - boxes[gi, 1]))
            pw = np.asarray(priors)[sel]
            stats["anchor_w"].extend(pw[:, 2].tolist())
            stats["anchor_h"].extend(pw[:, 3].tolist())
    return {k: np.asarray(v) for k, v in stats.items()}


def viz_anchor_strategy(stats, tb_writer, step=0):
    """Log anchor-coverage histograms to TB."""
    if tb_writer.writer is None:
        return
    for key, arr in stats.items():
        if len(arr):
            tb_writer.writer.add_histogram("anchors/" + key, arr, step)


def viz_feature_maps(sources, tb_writer, tag="features", step=0):
    """Log per-source mean-activation heatmaps (visualize_utils.py:135)."""
    for i, s in enumerate(sources):
        fm = np.asarray(s)[0]  # first image, HWC
        heat = fm.mean(-1)
        rng = heat.max() - heat.min()
        heat = (heat - heat.min()) / (rng + 1e-9)
        img = (np.stack([heat] * 3, -1) * 255).astype(np.uint8)
        tb_writer.add_image("{}/source_{}".format(tag, i), img, step)


def viz_grads(source_fn, image, pixel_means, tb_writer, tag="module_grads",
              step=0):
    """Input-gradient saliency per source feature map.

    Parity: /root/reference/lib/utils/visualize_utils.py viz_grads:152 /
    viz_module_grads:189 — there each captured feature map is
    back-propagated with an all-ones cotangent and the input's gradient
    (clamped at 0, plus the pixel mean) is logged as an image. Here the
    same quantity is jax.grad of sum(source_i) w.r.t. the input.

    Args:
        source_fn: image [1,H,W,3] f32 (RGB, mean-subtracted) -> list of
            source feature maps (e.g. a closure over model.apply with
            return_sources=True).
        image: [H,W,3] or [1,H,W,3] network-input image.
        pixel_means: BGR means (cfg.DATASET.PIXEL_MEANS) added back for
            visibility, channel-flipped to the RGB input order.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(image, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n_sources = len(source_fn(x))
    mean_rgb = np.asarray(pixel_means, np.float32)[::-1]
    for i in range(n_sources):
        def score(im, _i=i):
            return jnp.sum(source_fn(im)[_i].astype(jnp.float32))
        g = np.asarray(jax.grad(score)(x))[0]
        sal = np.clip(np.clip(g, 0, None) + mean_rgb, 0, 255)
        tb_writer.add_image("{}/source_{}".format(tag, i),
                            sal.astype(np.uint8), step)


def viz_prior_anchors(prior_box, layer_dims, tb_writer, image=None, step=2,
                      tag="base/feature_map"):
    """Per-feature-map anchor renderings.

    Parity: /root/reference/lib/layers/functions/prior_box.py:55-90
    (_prior_vis under the @vis decorator): for every feature map k and
    every anchor slot a, draw each cell's center as a red dot and, on
    the diagonal cells only, the anchor rectangle in green; one TB image
    per (map, slot) tagged base/feature_map_{k}_{a}.

    Args:
        prior_box: a PriorBoxSSD (uses image_size/steps/_cell_priors).
        layer_dims: [(H_k, W_k), ...] measured feature-map dims.
        image: optional uint8 BGR background; blank white otherwise.
    """
    import cv2

    img_h, img_w = prior_box.image_size
    if image is None:
        base = np.full((img_h, img_w, 3), 255, np.uint8)
    else:
        base = cv2.resize(np.asarray(image).astype(np.uint8),
                          (img_w, img_h))
    for k, (fh, fw) in enumerate(layer_dims):
        steps_x = img_w / prior_box.steps[k]
        steps_y = img_h / prior_box.steps[k]
        for a in range(prior_box.num_priors[k]):
            im = base.copy()
            for i in range(fh):
                for j in range(fw):
                    cx = (j + 0.5) / steps_x
                    cy = (i + 0.5) / steps_y
                    px, py = int(cx * img_w), int(cy * img_h)
                    cv2.circle(im, (px, py), 1, (0, 0, 255), -1)
                    if i == j:  # reference draws only diagonal anchors
                        c = prior_box._cell_priors(cx, cy, k)[a]
                        p1 = (int((c[0] - c[2] / 2) * img_w),
                              int((c[1] - c[3] / 2) * img_h))
                        p2 = (int((c[0] + c[2] / 2) * img_w),
                              int((c[1] + c[3] / 2) * img_h))
                        cv2.rectangle(im, p1, p2, (0, 255, 0), 1)
            tb_writer.add_image("{}_{}_{}".format(tag, k, a),
                                im[:, :, ::-1], step)
