#!/usr/bin/env python
"""Linear separability probe for RefineDet TCB features.

The iter-6k at-scale run's ODM classified positives at near-chance
(tools/diag_refinedet.py) while its loc branch refined IoU 0.82->0.88
on the SAME features. This probe asks the discriminating question: can
a *fresh linear classifier* separate the classes from (a) the trained
TCB outputs and (b) the raw backbone sources, at the ODM-positive
positions? (a) bad + (b) good => the TCB pathway destroys class
information; (a) good => features fine, the failure is in the ODM conf
training dynamics (loss/mining/schedule).

Usage: python tools/probe_tcb_features.py weights/tests/refinedet_synth_r4
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def fit_linear(X, y, num_classes, steps=300, lr=0.5, seed=0):
    """Full-batch multinomial logistic regression in numpy with a 70/30
    split; returns (train_acc, heldout_acc). With n_samples ~ n_features
    train accuracy alone would be memorization, so held-out is the
    separability measure."""
    import numpy as np
    X = np.asarray(X, np.float64)
    X = (X - X.mean(0)) / (X.std(0) + 1e-6)
    X = np.concatenate([X, np.ones((len(X), 1))], 1)
    rs = np.random.RandomState(seed)
    perm = rs.permutation(len(X))
    cut = int(0.7 * len(X))
    tr, te = perm[:cut], perm[cut:]
    W = np.zeros((X.shape[1], num_classes))
    onehot = np.eye(num_classes)[y]
    for _ in range(steps):
        z = X[tr] @ W
        z -= z.max(1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(1, keepdims=True)
        W -= lr * X[tr].T @ (p - onehot[tr]) / len(tr)
    acc = lambda ix: float((np.argmax(X[ix] @ W, 1) == y[ix]).mean())
    return acc(tr), acc(te)


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from odtpu.data import dataset_factory
    from odtpu.models import model_factory
    from odtpu.ops.boxes import center_size, decode
    from odtpu.ops.matching import match
    from odtpu.utils.checkpoint import restore_eval_variables
    from odtpu.utils.config import load_cfg
    from odtpu.layers.losses import _XFORM_CLIP

    cfg = load_cfg(osp.join(args.run_dir, "config_used.yml"))
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.EVAL_BATCH_SIZE = args.batch
    cfg.DATASET.NUM_WORKERS = 2
    cfg.DATASET.CACHE_IMAGES = False
    model, priors, layer_dims = model_factory("train", cfg)
    variables = restore_eval_variables(model, cfg,
                                       osp.join(args.run_dir, "ckpt"))
    loader = dataset_factory("eval", cfg)
    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    overlap = float(cfg.LOSS.OVERLAP_THRESH)
    pixel_means = tuple(float(m) for m in cfg.DATASET.PIXEL_MEANS)
    num_fg = int(cfg.MODEL.NUM_CLASSES) - 1

    def fwd(params, priors_arg, images, boxes, labels):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) \
                - jnp.asarray(pixel_means, jnp.float32)
            images = images[..., ::-1]
        is_tcb = lambda mdl, _m: (mdl.name or "").startswith("tcb_")
        (arm_loc, arm_conf, odm_loc, odm_conf, sources), inter = model.apply(
            {"params": variables["params"]}, images, phase="train",
            train=False, return_sources=True,
            capture_intermediates=is_tcb, mutable=["intermediates"])
        tcb = [inter["intermediates"][f"tcb_{i}"]["__call__"][0]
               for i in range(len(sources))]

        clip = _XFORM_CLIP / float(variances[1])
        arm_loc_c = jnp.concatenate(
            [arm_loc[..., :2], jnp.clip(arm_loc[..., 2:], -clip, clip)], -1)
        refined = center_size(decode(arm_loc_c, priors_arg[None], variances))
        arm_prob = jax.nn.softmax(arm_conf, axis=-1)
        ignore = arm_prob[..., 0] > 0.99
        degenerate = jnp.asarray([-4.0, -4.0, 1e-3, 1e-3], refined.dtype)
        refined_m = jnp.where(ignore[..., None], degenerate, refined)

        def match_one(b, l, pri):
            _, conf_t, _ = match(b, l, pri, variances, overlap)
            return conf_t

        odm_t = jax.vmap(match_one)(boxes, labels, refined_m)
        odm_t = jnp.where(ignore, 0, odm_t)
        return tcb, sources, odm_t

    jf = jax.jit(fwd)
    priors_dev = jax.device_put(jnp.asarray(priors))

    # anchor index -> (level, cell) decomposition
    counts = []
    from odtpu.models import create_model
    _, prior = create_model(cfg)
    for (h, w), a in zip(layer_dims, prior.num_priors):
        counts.append(h * w * a)
    offs = np.cumsum([0] + counts)

    feats_tcb, feats_src, ys = [], [], []
    for bi, batch in enumerate(loader):
        if bi >= args.batches:
            break
        labels = batch["labels"]
        tcb, sources, odm_t = jf(variables["params"], priors_dev,
                                 batch["images"], batch["boxes"], labels)
        odm_t = np.asarray(odm_t)
        tcb0 = np.asarray(tcb[0], np.float32)      # [B, H0, W0, 256]
        src0 = np.asarray(sources[0], np.float32)  # [B, H0, W0, 512]
        h0, w0 = layer_dims[0]
        a0 = prior.num_priors[0]
        for b in range(odm_t.shape[0]):
            idx = np.nonzero((odm_t[b] > 0) &
                             (np.arange(odm_t.shape[1]) < offs[1]))[0]
            for p in idx:
                cell = p // a0
                cy, cx = divmod(int(cell), w0)
                feats_tcb.append(tcb0[b, cy, cx])
                feats_src.append(src0[b, cy, cx])
                ys.append(int(odm_t[b, p]) - 1)

    ys = np.asarray(ys)
    print("level-0 ODM positives collected:", len(ys),
          "| classes present:", len(set(ys.tolist())))
    tr_t, te_t = fit_linear(np.asarray(feats_tcb), ys, num_fg)
    tr_s, te_s = fit_linear(np.asarray(feats_src), ys, num_fg)
    print("linear probe on TCB features    train {:.3f} heldout {:.3f}"
          .format(tr_t, te_t))
    print("linear probe on source features train {:.3f} heldout {:.3f}"
          .format(tr_s, te_s))
    print("chance = {:.3f}".format(1.0 / max(len(set(ys.tolist())), 1)))


if __name__ == "__main__":
    main()
