#!/usr/bin/env python
"""AOT model export: serialize the fused eval step to a portable artifact.

The reference framework has no deployment story beyond pickled torch
checkpoints that require the full model zoo at inference time. This tool
exports the complete serving computation — uint8 BGR batch -> mean
subtract -> BGR->RGB -> backbone -> heads -> decode -> per-class NMS ->
compact [B, top_k, 6] detections — as a *self-describing* artifact:

    * ``module.bin``   versioned StableHLO (``jax.export``), lowered for
                       both CPU and TPU;
    * ``weights.npz``  the flat weight list, in call order;
    * ``meta.json``    shapes, class names, calling convention.

Loading needs jax + numpy only: no odtpu model code, no config system,
no Flax — the graph (including priors and pixel means, baked as
constants) is the artifact. This is the TPU-native analog of torchscript
/ ONNX export for serving.

Usage:
    # export (randomly-initialized unless --ckpt is given)
    python tools/export_model.py export --out ssd300.odtpux \
        [--cfg cfgs/base/ssd_vgg16_voc.yml] [--ckpt weights/.../ckpt|.npz] \
        [--batch 1]          # --batch 0 = shape-polymorphic (any batch)

    # run the artifact on an image, no framework code involved
    python tools/export_model.py run --artifact ssd300.odtpux \
        --image img.jpg [--conf 0.5]
"""

from __future__ import annotations

import argparse
import copy
import io
import json
import os.path as osp
import sys
import zipfile

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

FORMAT_VERSION = 1


def export_artifact(out_path, cfg_path="", ckpt="", batch=1, cfg=None,
                    quant=""):
    """Build the fused eval step from a config (+ optional checkpoint)
    and serialize it to `out_path`. Returns the meta dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from odtpu.data.voc import VOC_CLASSES
    from odtpu.models import model_factory
    from odtpu.ops.detect import detect_out_compact
    from odtpu.utils.checkpoint import restore_eval_variables
    from odtpu.utils.config import load_cfg

    if cfg is None:
        if cfg_path and not osp.isfile(cfg_path):
            # a deployment artifact built from the wrong config is a
            # silent disaster — unlike train.py's interactive default
            # fallback, a missing path here is always an error
            raise FileNotFoundError("config not found: " + cfg_path)
        cfg = load_cfg(cfg_path or None)
    if quant:
        cfg = copy.deepcopy(cfg)  # never leak the mode into a caller cfg
        cfg.TPU.QUANT = quant
    model, priors, _ = model_factory("eval", cfg)
    variables = restore_eval_variables(model, cfg, ckpt)

    # flat-list calling convention: the artifact consumer rebuilds the
    # weight list from weights.npz by index and never sees the pytree
    leaves, treedef = jax.tree.flatten(variables)
    variances = tuple(cfg.MODEL.VARIANCE)
    ih, iw = cfg.MODEL.IMAGE_SIZE
    # priors + pixel means are deterministic functions of the config:
    # bake them as graph constants so the artifact is self-contained
    # (small: SSD300 priors are 8732x4 f32 ~ 140 KB)
    priors_c = jnp.asarray(priors)
    mean_c = jnp.asarray(np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32))

    from odtpu.models.common import quantized

    def infer(ws, x_u8):
        vs = jax.tree.unflatten(treedef, ws)
        x = x_u8.astype(jnp.float32) - mean_c
        x = x[..., ::-1]  # BGR input (cv2 convention) -> RGB
        # int8 mode serializes the quantized graph itself (s8 convs are
        # plain StableHLO): the artifact then serves quantized on any
        # backend, weights unchanged
        with quantized(str(cfg.TPU.QUANT or "")):
            loc, conf = model.apply(vs, x, phase="eval", train=False)
        # the lax NMS path lowers on any platform; the Pallas kernel is
        # a jit-time routing choice, not part of the portable graph
        return detect_out_compact(loc, conf, priors_c, variances,
                                  conf_thresh=cfg.EVAL.CONF_THRESH,
                                  nms_thresh=cfg.EVAL.NMS_THRESH,
                                  top_k=cfg.EVAL.TOP_K, impl="lax")

    ws_spec = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    # batch=0 -> shape-polymorphic artifact: one module serves any
    # batch size (the lax NMS path is fully polymorphic in B)
    bdim = jexport.symbolic_shape("b")[0] if batch == 0 else batch
    x_spec = jax.ShapeDtypeStruct((bdim, ih, iw, 3), jnp.uint8)
    exp = jexport.export(jax.jit(infer), platforms=("cpu", "tpu"))(
        ws_spec, x_spec)

    n_cls = int(cfg.DATASET.NUM_CLASSES)
    meta = {
        "format_version": FORMAT_VERSION,
        "model": "{}-{}".format(cfg.MODEL.SSD_TYPE, cfg.MODEL.BASE),
        "batch": int(batch),
        "image_size": [int(ih), int(iw)],
        "input": "uint8 BGR [B,H,W,3] (cv2 imread order)",
        "output": "[B, {}, 6] rows (score,x1,y1,x2,y2,cls), desc score,"
                  " zero-padded; coords normalized".format(
                      int(cfg.EVAL.TOP_K)),
        "num_weights": len(leaves),
        "quant": str(cfg.TPU.QUANT or ""),
        "platforms": ["cpu", "tpu"],
        "class_names": (list(VOC_CLASSES) if n_cls == 20
                        else [str(i) for i in range(n_cls)]),
    }
    wbuf = io.BytesIO()
    np.savez(wbuf, **{"w%05d" % i: np.asarray(l)
                      for i, l in enumerate(leaves)})
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(meta, indent=1))
        z.writestr("module.bin", exp.serialize())
        z.writestr("weights.npz", wbuf.getvalue())
    return meta


def load_artifact(path):
    """Load an exported artifact. Needs jax + numpy only.

    Returns (call, meta): call(x_u8 [B,H,W,3]) -> [B, top_k, 6] numpy.
    """
    import numpy as np
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError("unsupported artifact version: {}".format(
                meta.get("format_version")))
        exp = jexport.deserialize(z.read("module.bin"))
        wz = np.load(io.BytesIO(z.read("weights.npz")))
        ws = [wz["w%05d" % i] for i in range(meta["num_weights"])]

    def call(x_u8):
        x_u8 = np.asarray(x_u8, np.uint8)
        b = meta["batch"] or "any"
        want = tuple([b] + meta["image_size"] + [3])
        ok = (x_u8.ndim == 4 and x_u8.shape[1:] == want[1:]
              and (meta["batch"] == 0 or x_u8.shape[0] == meta["batch"]))
        if not ok:
            raise ValueError("input shape {} != exported {}".format(
                x_u8.shape, want))
        return np.asarray(exp.call(ws, x_u8))

    return call, meta


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("--out", required=True)
    pe.add_argument("--cfg", default="")
    pe.add_argument("--ckpt", default="")
    pe.add_argument("--batch", type=int, default=1)
    pe.add_argument("--quant", default="", choices=["", "int8"],
                    help="serialize the int8-quantized eval graph")
    pr = sub.add_parser("run")
    pr.add_argument("--artifact", required=True)
    pr.add_argument("--image", required=True)
    pr.add_argument("--conf", type=float, default=0.5)
    args = p.parse_args()

    if args.cmd == "export":
        meta = export_artifact(args.out, args.cfg, args.ckpt, args.batch,
                               quant=args.quant)
        size_mb = osp.getsize(args.out) / 1e6
        print(json.dumps({"out": args.out, "size_mb": round(size_mb, 1),
                          **meta}, indent=1))
        return

    import cv2
    call, meta = load_artifact(args.artifact)
    img = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if img is None:
        sys.exit("undecodable image: " + args.image)
    h, w = img.shape[:2]
    ih, iw = meta["image_size"]
    x = cv2.resize(img, (iw, ih))[None]
    if meta["batch"] > 1:
        import numpy as np
        x = np.repeat(x, meta["batch"], axis=0)
    det = call(x)[0]
    names = meta["class_names"]
    out = []
    for score, x1, y1, x2, y2, cls in det:
        # cls 0 rows are the fixed-shape output's zero padding (and
        # score 0 can't pass a real conf gate) — drop them even when
        # --conf 0, else they'd mislabel as names[-1]
        if score <= 0 or int(cls) < 1 or score < args.conf:
            continue
        out.append({"class": names[int(cls) - 1], "score": round(
            float(score), 4), "box": [round(float(x1 * w), 1),
                                      round(float(y1 * h), 1),
                                      round(float(x2 * w), 1),
                                      round(float(y2 * h), 1)]})
    print(json.dumps({"detections": out}, indent=1))


if __name__ == "__main__":
    main()
