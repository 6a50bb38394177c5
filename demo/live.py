#!/usr/bin/env python
"""Webcam / video-stream detection loop with an FPS counter.

Parity target: /root/reference/demo/live.py (cv2 webcam loop at
conf >= 0.6). Works on any cv2.VideoCapture source; without a display
(headless), pass --headless to just print per-frame detections.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(argv=None):
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--source", default="0",
                   help="cv2 VideoCapture source (index or path)")
    p.add_argument("--cfg", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--conf", type=float, default=0.6)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--max_frames", type=int, default=0)
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from odtpu.data.voc import VOC_CLASSES
    from odtpu.models import model_factory
    from odtpu.ops.detect import detect_out_compact
    from odtpu.utils.config import load_cfg

    cfg = load_cfg(args.cfg if args.cfg and osp.isfile(args.cfg) else None)
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    # --ckpt takes an orbax dir OR a converted reference .npz
    from odtpu.utils.checkpoint import restore_eval_variables
    variables = restore_eval_variables(model, cfg, args.ckpt)

    priors_j = jnp.asarray(priors)
    variances = tuple(cfg.MODEL.VARIANCE)

    @jax.jit
    def infer(variables, priors, x):
        loc, conf = model.apply(variables, x, phase="eval", train=False)
        return detect_out_compact(loc, conf, priors, variances)

    mean = np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32)
    ih, iw = cfg.MODEL.IMAGE_SIZE
    source = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise SystemExit("cannot open source {!r}".format(args.source))

    names = list(VOC_CLASSES) if cfg.DATASET.NUM_CLASSES == 20 else None
    frames = 0
    t0 = time.time()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        x = cv2.resize(frame, (iw, ih)).astype(np.float32) - mean
        det = np.asarray(infer(variables, priors_j,
                               jnp.asarray(x[None, :, :, ::-1])))[0]
        frames += 1
        fps = frames / (time.time() - t0)
        for row in det:
            score, x1, y1, x2, y2, cls = row
            if score < args.conf:
                continue
            label = names[int(cls) - 1] if names else str(int(cls))
            if args.headless:
                print("frame {} {} {:.2f} [{:.0f},{:.0f},{:.0f},{:.0f}]"
                      .format(frames, label, score, x1 * w, y1 * h,
                              x2 * w, y2 * h))
            else:
                cv2.rectangle(frame, (int(x1 * w), int(y1 * h)),
                              (int(x2 * w), int(y2 * h)), (0, 255, 0), 2)
                cv2.putText(frame, "{} {:.2f}".format(label, score),
                            (int(x1 * w), int(y1 * h) - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        if not args.headless:
            cv2.putText(frame, "FPS {:.1f}".format(fps), (8, 20),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 0, 255), 2)
            cv2.imshow("odtpu live", frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        if args.max_frames and frames >= args.max_frames:
            break
    cap.release()
    print("processed {} frames, {:.1f} fps".format(
        frames, frames / max(time.time() - t0, 1e-9)))


if __name__ == "__main__":
    main()
