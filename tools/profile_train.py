#!/usr/bin/env python
"""Per-stage on-chip timing of the SSD300 train step.

Same tunnel-safe method as tools/profile_eval.py: inputs are generated
host-side once, every measurement chains N iterations inside one jit
with a data dependence, and the host syncs on a single scalar read.

Stages: full train step / train forward only / forward+loss (no grad) /
matching alone / device photometric aug alone. Together these itemize
fwd : bwd : match+loss : aug : update.

Usage: python tools/profile_train.py [--batch 32] [--chain 10]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="",
                   help="yaml to profile a non-default spec")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--remat", action="store_true",
                   help="force TPU.REMAT on for an A/B")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from odtpu.data.device_aug import preprocess_train_batch
    from odtpu.layers.losses import multibox_loss
    from odtpu.models import model_factory
    from odtpu.ops.matching import match_batch
    from odtpu.parallel import (create_train_state, make_mesh,
                                make_train_step, shard_batch)
    from odtpu.utils.config import default_cfg, load_cfg

    cfg = load_cfg(args.cfg) if args.cfg else default_cfg()
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.DEVICE_PHOTOMETRIC = True
    if args.remat:
        cfg.TPU.REMAT = True
    cfg.TRAIN.OPTIMIZER.LR = 1e-5
    B = args.batch
    N = args.chain
    h, w = cfg.MODEL.IMAGE_SIZE
    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    means = tuple(float(m) for m in cfg.DATASET.PIXEL_MEANS)

    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh, donate=False)
    priors_d = jax.device_put(jnp.asarray(priors))

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (B, h, w, 3), dtype=np.uint8)
    boxes = np.tile(np.array([[[0.2, 0.2, 0.7, 0.7]]], np.float32),
                    (B, 60, 1))
    labels = np.full((B, 60), -1, np.int32)
    labels[:, 0] = 3
    imgs_d, boxes_d, labels_d = shard_batch((imgs, boxes, labels), mesh)
    imgs_f = jnp.asarray(imgs, jnp.float32)

    def bench(name, chained_fn, *fargs):
        float(chained_fn(*fargs))  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(chained_fn(*fargs))
        dt = (time.time() - t0) / reps / N * 1000
        print("{:34s} {:8.2f} ms/iter {:7.0f} img/s".format(
            name, dt, B / dt * 1000))
        return dt

    # full train step, chained (state threads the dependence naturally);
    # priors ride as a loop-invariant argument via step.raw_step —
    # jitting over the wrapper would capture its committed priors array
    # as a closure constant (the documented tunnel-degrading pattern)
    raw_step = step.raw_step

    @jax.jit
    def chained_jit(state, priors_arg, imgs, boxes, labels):
        def body(i, carry):
            st, acc = carry
            st, m = raw_step(st, priors_arg, imgs, boxes, labels)
            return st, acc + m["loss"]
        return jax.lax.fori_loop(0, N, body, (state, 0.0))[1]

    def chained_step(state, imgs, boxes, labels):
        return chained_jit(state, step.priors, imgs, boxes, labels)

    bench("train step (aug+fwd+bwd+update)", chained_step,
          state, imgs_d, boxes_d, labels_d)

    params, stats = state.params, state.batch_stats

    def fwd(params, x):
        return model.apply({"params": params}, x, phase="train",
                           train=True)

    @jax.jit
    def chained_fwd(params, x):
        def body(i, carry):
            xc, acc = carry
            loc, conf = fwd(params, xc)
            s = jnp.sum(loc[..., 0]) + jnp.sum(conf[..., 0])
            return xc + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, N, body, (x, 0.0))[1]

    bench("train forward only", chained_fwd, params, imgs_f)

    def loss_only(params, x, boxes, labels, priors_arg):
        loc, conf = fwd(params, x)
        out = multibox_loss(loc, conf, priors_arg, boxes, labels,
                            variances, 0.5, 3)
        n = jnp.maximum(out.num_pos, 1).astype(jnp.float32)
        return out.loss_conf_sum / n + out.loss_loc_sum / n

    @jax.jit
    def chained_loss(params, x, boxes, labels, priors_arg):
        def body(i, carry):
            xc, acc = carry
            l = loss_only(params, xc, boxes, labels, priors_arg)
            return xc + l * 1e-30, acc + l
        return jax.lax.fori_loop(0, N, body, (x, 0.0))[1]

    bench("forward+loss (no grad)", chained_loss, params, imgs_f,
          jnp.asarray(boxes), jnp.asarray(labels), priors_d)

    @jax.jit
    def chained_match(boxes, labels, priors_arg):
        def body(i, carry):
            b, acc = carry
            loc_t, conf_t, pos = match_batch(b, labels, priors_arg,
                                             variances, 0.5)
            s = jnp.sum(loc_t) + jnp.sum(conf_t) + jnp.sum(pos)
            return b + s * 1e-30, acc + s
        return jax.lax.fori_loop(0, N, body, (boxes, 0.0))[1]

    try:
        bench("matching (GT<->priors)", chained_match,
              jnp.asarray(boxes), jnp.asarray(labels), priors_d)
    except Exception as e:
        print("matching skipped:", type(e).__name__, str(e)[:160])

    @jax.jit
    def chained_aug(imgs_u8):
        def body(i, carry):
            acc = carry
            x = preprocess_train_batch(
                imgs_u8, jax.random.fold_in(jax.random.PRNGKey(0),
                                            i.astype(jnp.uint32)), means)
            return acc + jnp.sum(x[..., 0])
        return jax.lax.fori_loop(0, N, body, 0.0)

    try:
        bench("device photometric aug", chained_aug, jnp.asarray(imgs))
    except Exception as e:
        print("device aug skipped:", type(e).__name__, str(e)[:160])


if __name__ == "__main__":
    main()
