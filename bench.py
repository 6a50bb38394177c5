#!/usr/bin/env python
"""End-to-end SSD300 inference benchmark (preprocess + forward + NMS).

Prints ONE JSON line:
  {"metric": "ssd300_images_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N / 46.0}

Baseline 46 img/s is the published SSD300 FPS on Titan X (reference
README.md:14; BASELINE.md). Pipeline per batch, matching the reference
eval path end to end:
  host: cv2 resize to 300x300 (uint8 BGR, threaded)
  -> H2D (uint8 — 4x fewer tunnel bytes than f32)
  -> device: f32 cast + BGR mean subtract + RGB flip (fused into the jit;
     identical math to the reference's SubtractMeans + channel flip,
     augmentations.py:56, det_dataset.py:49)
  -> VGG16-SSD300 forward (bf16 MXU) + decode + per-class NMS
  -> D2H: compact [B, 200, 6] detections.

Execution is deliberately serial/blocking per stage: this TPU is reached
through an experimental tunnel (axon) whose transfer path degrades or
wedges under deep async queues and closure-captured jit constants (both
measured in this environment). Priors/mean ride through jit as
arguments.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np


def _tunnel_alive(seconds=90):
    """True if a trivial device round-trip completes within the deadline.
    Runs in a SUBPROCESS: a wedged axon tunnel blocks inside C calls
    where SIGALRM is never delivered, so in-process deadlines can't
    interrupt it."""
    import subprocess
    snippet = ("import jax, numpy as np;"
               "x = jax.device_put(np.ones(64, np.float32));"
               "print(int(float(np.asarray(x).sum())))")
    try:
        r = subprocess.run([sys.executable, "-c", snippet],
                           capture_output=True, timeout=seconds, text=True)
        return "64" in r.stdout
    except Exception:
        return False


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    import cv2
    from odtpu.models import init_model, model_factory
    from odtpu.ops.detect import detect_out_compact
    from odtpu.utils.config import default_cfg

    # health-gate BEFORE any in-process jax backend init: a wedged tunnel
    # blocks the first device query forever and no JSON would print
    want_tpu = (os.environ.get("JAX_PLATFORMS", "").strip() != "cpu"
                and os.environ.get("ODTPU_BENCH_FALLBACK") != "1")
    if want_tpu:
        ok = _tunnel_alive()
        for _ in range(4):
            if ok:
                break
            time.sleep(120)
            ok = _tunnel_alive()
        if not ok:
            # TPU unreachable: re-exec on CPU so a JSON line still lands
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       ODTPU_BENCH_FALLBACK="1")
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)

    cfg = default_cfg()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    variances = tuple(cfg.MODEL.VARIANCE)
    device = jax.devices()[0]
    priors = jax.device_put(jnp.asarray(priors), device)
    mean_dev = jax.device_put(
        np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32), device)

    B = 32 if on_tpu else 4
    WARMUP, ITERS = 3, (10 if on_tpu else 2)

    def infer_fn(variables, priors, x_u8, mean):
        x = x_u8.astype(jnp.float32) - mean  # BGR means
        x = x[..., ::-1]  # BGR -> RGB
        loc, conf = model.apply(variables, x, phase="eval", train=False)
        return detect_out_compact(
            loc, conf, priors, variances,
            conf_thresh=float(cfg.EVAL.CONF_THRESH),
            nms_thresh=float(cfg.EVAL.NMS_THRESH),
            top_k=int(cfg.EVAL.TOP_K))

    infer = jax.jit(infer_fn)

    rng = np.random.RandomState(0)
    raw = [rng.randint(0, 255, (375, 500, 3), dtype=np.uint8)
           for _ in range(B)]
    pool = ThreadPoolExecutor(8)

    def make_batch():
        return np.stack(list(pool.map(
            lambda im: cv2.resize(im, (300, 300)), raw)))

    # compile + flush the tunnel's first-call pathologies
    for _ in range(WARMUP):
        out = infer(variables, priors,
                    jax.device_put(make_batch(), device), mean_dev)
        np.asarray(out)

    lat = []
    t0 = time.time()
    for _ in range(ITERS):
        t1 = time.time()
        xb = make_batch()
        xd = jax.device_put(xb, device)
        out = infer(variables, priors, xd, mean_dev)
        np.asarray(out)  # full sync incl. D2H of compact detections
        lat.append(time.time() - t1)
    total = time.time() - t0
    ips = ITERS * B / total
    p50_ms = float(np.percentile(lat, 50) * 1000 / B)

    extra = {"batch": B, "p50_ms_per_image": round(p50_ms, 3),
             "backend": jax.default_backend()}

    # optional extras under a hard alarm: the tunnel can wedge
    # indefinitely and the primary JSON line must still be printed
    import signal

    class _Timeout(Exception):
        pass

    def _with_deadline(fn, seconds):
        def onalarm(signum, frame):
            raise _Timeout()
        old = signal.signal(signal.SIGALRM, onalarm)
        signal.alarm(seconds)
        try:
            return fn()
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    def _b1_latency():
        # serving path at B=1 through the production (Pallas on TPU)
        # kernel — hardware-verified bit-exact at single-set grids
        from odtpu.ops.detect import detect_out_compact as _doc

        def infer1_fn(variables, priors, x_u8, mean):
            x = x_u8.astype(jnp.float32) - mean
            x = x[..., ::-1]
            loc, conf = model.apply(variables, x, phase="eval",
                                    train=False)
            return _doc(loc, conf, priors, variances,
                        conf_thresh=float(cfg.EVAL.CONF_THRESH),
                        nms_thresh=float(cfg.EVAL.NMS_THRESH),
                        top_k=int(cfg.EVAL.TOP_K))

        infer1 = jax.jit(infer1_fn)
        x1 = jax.device_put(make_batch()[:1], device)
        out = infer1(variables, priors, x1, mean_dev)
        np.asarray(out)  # compile
        lat1 = []
        for _ in range(10):
            t1 = time.time()
            xb = cv2.resize(raw[0], (300, 300))[None]
            out = infer1(variables, priors, jax.device_put(xb, device),
                         mean_dev)
            np.asarray(out)
            lat1.append(time.time() - t1)
        return round(float(np.percentile(lat1, 50) * 1000), 2)

    try:
        extra["p50_latency_ms_b1"] = _with_deadline(_b1_latency, 120)
    except Exception as e:
        extra["p50_latency_ms_b1"] = "skipped: {}".format(
            type(e).__name__)
    try:
        extra["train_img_per_sec"] = _with_deadline(
            lambda: round(_train_throughput(cfg, B), 1), 240)
    except Exception as e:  # keep the primary metric robust
        extra["train_img_per_sec"] = "skipped: {}".format(
            type(e).__name__)

    print(json.dumps({
        "metric": "ssd300_images_per_sec",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / 46.0, 2),
        "extra": extra,
    }))


def _train_throughput(cfg, B, iters=10):
    """SSD300 bf16 train-step throughput (device-photometric pipeline).
    NOTE: on the axon tunnel block_until_ready can return early; a
    float() read of the loss is the reliable sync."""
    import numpy as np
    from odtpu.models import model_factory
    from odtpu.parallel import (create_train_state, make_mesh,
                                make_train_step, shard_batch)
    cfg.DATASET.DEVICE_PHOTOMETRIC = True
    cfg.TRAIN.OPTIMIZER.LR = 1e-5
    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (B, 300, 300, 3), dtype=np.uint8)
    boxes = np.tile(np.array([[[0.2, 0.2, 0.7, 0.7]]], np.float32),
                    (B, 60, 1))
    labels = np.full((B, 60), -1, np.int32)
    labels[:, 0] = 3
    batch = shard_batch((imgs, boxes, labels), mesh)
    state, m = step(state, *batch)
    float(m["loss"])  # compile + sync
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, *batch)
        float(m["loss"])
    return iters * B / (time.time() - t0)


if __name__ == "__main__":
    main()
