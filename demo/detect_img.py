#!/usr/bin/env python
"""Single-image detection demo.

Parity target: /root/reference/demo/detect_img.py (load net, run the
detect head, draw boxes with score >= 0.5 scaled to image size; the
reference script targets a stale tree layout — this one runs).

Usage:
    python demo/detect_img.py --image path.jpg [--ckpt weights/.../ckpt]
                              [--out out.jpg] [--conf 0.5]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--cfg", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--out", default="detect_out.jpg")
    p.add_argument("--conf", type=float, default=0.5)
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from odtpu.data.voc import VOC_CLASSES
    from odtpu.models import model_factory
    from odtpu.ops.detect import detect_out_compact
    from odtpu.utils.checkpoint import restore_eval_variables
    from odtpu.utils.config import load_cfg

    cfg = load_cfg(args.cfg if args.cfg and osp.isfile(args.cfg) else None)
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    # --ckpt takes an orbax dir OR a converted reference .npz
    variables = restore_eval_variables(model, cfg, args.ckpt)

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit("cannot read " + args.image)
    h, w = img.shape[:2]
    ih, iw = cfg.MODEL.IMAGE_SIZE
    mean = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)
    x = cv2.resize(img, (iw, ih)).astype(np.float32) - mean
    x = jnp.asarray(x[None, :, :, ::-1])

    loc, conf = model.apply(variables, x, phase="eval", train=False)
    det = np.asarray(detect_out_compact(
        loc, conf, jnp.asarray(priors), tuple(cfg.MODEL.VARIANCE)))[0]

    names = list(VOC_CLASSES) if cfg.DATASET.NUM_CLASSES == 20 else None
    kept = 0
    for row in det:
        score, x1, y1, x2, y2, cls = row
        if score < args.conf:
            continue
        kept += 1
        pt1 = (int(np.clip(x1 * w, 0, w - 1)), int(np.clip(y1 * h, 0, h - 1)))
        pt2 = (int(np.clip(x2 * w, 0, w - 1)), int(np.clip(y2 * h, 0, h - 1)))
        cv2.rectangle(img, pt1, pt2, (0, 255, 0), 2)
        label = names[int(cls) - 1] if names else str(int(cls))
        cv2.putText(img, "{} {:.2f}".format(label, score),
                    (pt1[0], max(pt1[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (0, 255, 0), 1)
    cv2.imwrite(args.out, img)
    print("{} detections >= {:.2f} -> {}".format(kept, args.conf, args.out))


if __name__ == "__main__":
    main()
