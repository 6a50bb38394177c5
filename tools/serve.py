#!/usr/bin/env python
"""Minimal production serving endpoint.

POST an image (raw JPEG/PNG bytes) to /detect and get detections JSON:
    {"detections": [{"class": str, "class_id": int, "score": float,
                     "box": [x1, y1, x2, y2]}  # pixels
                    ...],
     "latency_ms": float}
GET /healthz -> {"ok": true}

The model is compiled once at startup; requests run the same jitted
preprocess+forward+NMS pipeline as bench.py. Single-threaded by design
(one TPU stream; the axon tunnel dislikes concurrent dispatch).

Usage:
    python tools/serve.py [--port 8500] [--ckpt weights/.../ckpt]
                          [--conf 0.5] [--cfg cfgs/base/ssd_vgg16_voc.yml]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def build_engine(cfg_path="", ckpt="", quant=""):
    """-> (infer(np.uint8 HWC BGR image) -> list[dict], class_names)."""
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from odtpu.data.voc import VOC_CLASSES
    from odtpu.models import model_factory
    from odtpu.ops.detect import detect_out_compact
    from odtpu.utils.config import load_cfg

    cfg = load_cfg(cfg_path if cfg_path and osp.isfile(cfg_path) else None)
    if quant:
        cfg.TPU.QUANT = quant
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    # ckpt takes an orbax dir OR a converted reference .npz
    from odtpu.utils.checkpoint import restore_eval_variables
    variables = restore_eval_variables(model, cfg, ckpt)

    priors_dev = jax.device_put(jnp.asarray(priors))
    mean_dev = jax.device_put(
        np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32))
    variances = tuple(cfg.MODEL.VARIANCE)
    ih, iw = cfg.MODEL.IMAGE_SIZE

    from odtpu.models.common import quantized

    @jax.jit
    def _infer(variables, priors, x_u8, mean):
        x = x_u8.astype(jnp.float32) - mean
        x = x[..., ::-1]
        with quantized(str(cfg.TPU.QUANT or "")):
            loc, conf = model.apply(variables, x, phase="eval",
                                    train=False)
        return detect_out_compact(loc, conf, priors, variances)

    names = list(VOC_CLASSES) if cfg.DATASET.NUM_CLASSES == 20 else \
        [str(i) for i in range(cfg.DATASET.NUM_CLASSES)]

    def infer(img_bgr_u8, conf_thresh=0.5):
        h, w = img_bgr_u8.shape[:2]
        x = cv2.resize(img_bgr_u8, (iw, ih))[None]
        det = np.asarray(_infer(variables, priors_dev, x, mean_dev))[0]
        out = []
        for row in det:
            score, x1, y1, x2, y2, cls = row
            if score < conf_thresh:
                continue
            out.append({
                "class": names[int(cls) - 1],
                "class_id": int(cls) - 1,
                "score": round(float(score), 4),
                "box": [round(float(x1 * w), 1), round(float(y1 * h), 1),
                        round(float(x2 * w), 1), round(float(y2 * h), 1)],
            })
        return out

    # warm the compile
    infer(np.zeros((ih, iw, 3), np.uint8), conf_thresh=1.1)
    return infer, names


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--cfg", default="")
    p.add_argument("--ckpt", default="")
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="quantized serving compute (overrides TPU.QUANT)")
    args = p.parse_args()

    import cv2
    import numpy as np
    from http.server import BaseHTTPRequestHandler, HTTPServer

    infer, _ = build_engine(args.cfg, args.ckpt, quant=args.quant)
    default_conf = args.conf

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                return self._json(200, {"ok": True})
            return self._json(404, {"error": "use POST /detect"})

        def do_POST(self):
            if not self.path.startswith("/detect"):
                return self._json(404, {"error": "use POST /detect"})
            n = int(self.headers.get("Content-Length", 0))
            if n == 0 or n > 32 * 1024 * 1024:
                return self._json(400, {"error": "bad content length"})
            data = self.rfile.read(n)
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
            if img is None:
                return self._json(400, {"error": "undecodable image"})
            t0 = time.time()
            dets = infer(img, default_conf)
            return self._json(200, {
                "detections": dets,
                "latency_ms": round((time.time() - t0) * 1000, 2)})

        def log_message(self, fmt, *a):  # quiet
            pass

    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    print("serving on :{} (POST /detect, GET /healthz)".format(args.port))
    srv.serve_forever()


if __name__ == "__main__":
    main()
