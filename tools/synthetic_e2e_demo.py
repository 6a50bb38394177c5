#!/usr/bin/env python
"""End-to-end learning demo on synthetic data: train a tiny SSD on a
generated VOC-style train split, evaluate VOC mAP on a HELD-OUT split,
print mAP before vs after training. No real dataset or pretrained
weights required — demonstrates the full train->checkpoint->eval system
generalizes, not just overfits.

Usage: python tools/synthetic_e2e_demo.py [--steps 300] [--tmp DIR]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--tmp", default="")
    args = p.parse_args()

    import numpy as np
    import jax

    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)),
                                "..", "tests"))
    from synth import make_voc
    from odtpu.data import dataset_factory
    from odtpu.eval import eval_solver_factory
    from odtpu.models import model_factory
    from odtpu.parallel import (create_train_state, make_eval_step,
                                make_mesh, make_train_step, shard_batch)
    from odtpu.utils.config import default_cfg, update_cfg

    root = args.tmp or tempfile.mkdtemp(prefix="odtpu_synth_")
    devkit = osp.join(root, "VOCdevkit")
    make_voc(devkit, setname="train", n_images=64, seed=100,
             min_size=120, max_size=200, num_classes=5)
    make_voc(devkit, setname="test", n_images=16, seed=200,
             min_size=120, max_size=200, num_classes=5)

    cfg = default_cfg()
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.DATASET_DIR = devkit
    cfg.DATASET.TRAIN_SETS = (("2007", "train"),)
    cfg.DATASET.TEST_SETS = (("2007", "test"),)
    cfg.DATASET.IMAGE_SIZE = (96, 96)
    cfg.DATASET.TRAIN_BATCH_SIZE = 16
    cfg.DATASET.EVAL_BATCH_SIZE = 16
    cfg.DATASET.NUM_WORKERS = 4
    cfg.DATASET.MAX_BOXES = 8
    cfg.MODEL.IMAGE_SIZE = (96, 96)
    cfg.MODEL.STEPS = [8, 16, 32, 96]
    cfg.MODEL.MIN_SIZES = [12, 28, 52, 80]
    cfg.MODEL.MAX_SIZES = [28, 52, 80, 96]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    cfg.TRAIN.OPTIMIZER.LR = 3e-4
    cfg.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 5.0
    cfg.TRAIN.LR_SCHEDULER.STEPS = (10 ** 9,)
    cfg.EVAL.CONF_THRESH = 0.05
    update_cfg(cfg)
    cfg.DATASET.DATASET_DIR = devkit
    cfg.MODEL.IMAGE_SIZE = (96, 96)

    model, priors, dims = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    eval_fn = make_eval_step(model, priors, cfg, mesh=mesh)

    val_loader = dataset_factory("eval", cfg)
    solver = eval_solver_factory(val_loader, cfg, osp.join(root, "eval"))

    _, maps0 = solver.validate(eval_fn, state.params, state.batch_stats)
    print("mAP before training: {:.4f}".format(maps0[0]))

    train_loader = dataset_factory("train", cfg)
    it = 0
    import time
    t0 = time.time()
    while it < args.steps:
        for batch in train_loader:
            if it >= args.steps:
                break
            sharded = shard_batch((batch["images"], batch["boxes"],
                                   batch["labels"]), mesh)
            state, m = step(state, *sharded)
            it += 1
            if it % 50 == 0:
                print("iter {} loss {:.3f}".format(it, float(m["loss"])))
    print("trained {} steps in {:.0f}s".format(it, time.time() - t0))

    _, maps1 = solver.validate(eval_fn, state.params, state.batch_stats)
    print("mAP after training (held-out): {:.4f}".format(maps1[0]))
    print("RESULT: {:.4f} -> {:.4f}".format(maps0[0], maps1[0]))


if __name__ == "__main__":
    main()
