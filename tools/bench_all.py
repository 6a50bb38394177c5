#!/usr/bin/env python
"""Per-family compute benchmark: forward + on-chip detect for every
detector in the zoo (synthetic inputs, compute-only — excludes the
host/tunnel transfer that bench.py measures end-to-end).

Usage: python tools/bench_all.py [--iters 10]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

FAMILIES = [
    # (name, ssd_type, base, size, batch)
    ("SSD300-VGG16", "SSD", "vgg16", 300, 32),
    ("SSD512-VGG16", "SSD", "vgg16", 512, 16),
    ("FPN300-VGG16", "FPN", "vgg16", 300, 32),
    ("FSSD300-VGG16", "FSSD", "vgg16", 300, 32),
    ("RFBNet300-VGG16", "RFBNet", "vgg16", 300, 32),
    ("SSD300-DRN22", "SSD", "drn_d_22", 300, 32),
    ("RefineDet320-VGG16", "RefineDet", "vgg16", 320, 32),
]


def build_cfg(ssd_type, base, size):
    from odtpu.models.refinedet import refinedet320_cfg
    from odtpu.utils.config import default_cfg
    import jax
    cfg = default_cfg()
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SSD_TYPE = ssd_type
    cfg.MODEL.BASE = base
    if ssd_type == "RefineDet":
        return refinedet320_cfg(cfg)
    if size == 512:
        cfg.DATASET.IMAGE_SIZE = (512, 512)
        cfg.MODEL.IMAGE_SIZE = (512, 512)
        cfg.MODEL.STEPS = [8, 16, 32, 64, 128, 256, 512]
        cfg.MODEL.MIN_SIZES = [35.84, 76.8, 153.6, 230.4, 307.2, 384.0,
                               460.8]
        cfg.MODEL.MAX_SIZES = [76.8, 153.6, 230.4, 307.2, 384.0, 460.8,
                               537.6]
        cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2, 3], [2, 3], [2, 3],
                                   [2], [2]]
    if ssd_type == "RFBNet":
        cfg.MODEL.ASPECT_RATIOS = ([[2, 3]] * 4 + [[2], [2]]) if size == 300 \
            else cfg.MODEL.ASPECT_RATIOS
    return cfg


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--only", default="",
                   help="substring filter on the model name (one model "
                        "per process avoids tunnel wedging)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from odtpu.models import init_model, model_factory
    from odtpu.parallel import make_eval_step

    print("backend:", jax.default_backend())
    print("{:<22} {:>6} {:>12} {:>12}".format(
        "model", "batch", "ms/batch", "img/s"))
    for (name, ssd_type, base, size, B) in FAMILIES:
        if args.only and args.only.lower() not in name.lower():
            continue
        try:
            cfg = build_cfg(ssd_type, base, size)
            model, priors, _ = model_factory("eval", cfg)
            variables = init_model(model, cfg)
            step = make_eval_step(model, priors, cfg)
            params = variables["params"]
            stats = variables.get("batch_stats", {})
            h, w = cfg.MODEL.IMAGE_SIZE
            x = jax.device_put(
                np.random.rand(B, h, w, 3).astype(np.float32))
            def sync(o):
                return float(jnp.sum(o["rows"] if isinstance(o, dict)
                                     else o))

            out = step(params, stats, x)
            sync(out)  # compile + reliable sync

            # RTT-free on-chip truth: chain the iterations inside ONE
            # jit; the data dependence through the carry stops XLA
            # from hoisting/CSE-ing the repeated step. Priors thread
            # through as a loop-invariant ARGUMENT via step.raw_step —
            # jitting over the wrapper would capture its committed
            # priors array as a closure constant (the documented
            # tunnel-degrading pattern).
            N_CHAIN = args.iters
            raw_step = step.raw_step

            @jax.jit
            def chained_jit(params, stats, priors_arg, x0):
                def body(i, carry):
                    xc, acc = carry
                    o = raw_step(params, stats, priors_arg, xc)
                    s = jnp.sum(o["rows"] if isinstance(o, dict) else o)
                    return xc + s * 1e-30, acc + s
                return jax.lax.fori_loop(0, N_CHAIN, body, (x0, 0.0))[1]

            def chained(params, stats, x, _jit=chained_jit, _p=step.priors):
                return _jit(params, stats, _p, x)

            float(chained(params, stats, x))  # compile
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                float(chained(params, stats, x))
            dt = (time.time() - t0) / reps / N_CHAIN
            print("{:<22} {:>6} {:>12.1f} {:>12.0f}".format(
                name, B, dt * 1e3, B / dt))
        except Exception as e:
            print("{:<22} FAILED: {}".format(name, e))


if __name__ == "__main__":
    main()
