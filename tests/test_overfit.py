"""Learning-loop proof: overfit a tiny SSD on one fixed synthetic batch
until the detect path localizes the objects — exercises matching, loss,
optimizer, decode and NMS as one system."""

import numpy as np
import jax
import jax.numpy as jnp

from odtpu.models import model_factory
from odtpu.parallel import (create_train_state, make_eval_step, make_mesh,
                            make_train_step, shard_batch)
from odtpu.utils.config import default_cfg


def test_overfit_single_batch(rng):
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [12, 24, 40, 56]
    cfg.MODEL.MAX_SIZES = [24, 40, 56, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    cfg.DATASET.MAX_BOXES = 4
    cfg.TRAIN.OPTIMIZER.LR = 5e-4
    cfg.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 5.0
    cfg.TRAIN.LR_SCHEDULER.STEPS = (10000,)
    cfg.EVAL.CONF_THRESH = 0.2

    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg, devices=jax.devices()[:1])
    state, tx = create_train_state(model, cfg, rng=jax.random.PRNGKey(0),
                                   mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    eval_fn = make_eval_step(model, priors, cfg, mesh=mesh)

    # one fixed batch: each image one bright rectangle on noise
    B = 4
    images = rng.rand(B, 64, 64, 3).astype(np.float32) * 50
    boxes = np.zeros((B, 4, 4), np.float32)
    labels = np.full((B, 4), -1, np.int32)
    gts = [(0.2, 0.2, 0.6, 0.6), (0.4, 0.4, 0.9, 0.9),
           (0.1, 0.5, 0.5, 0.9), (0.3, 0.1, 0.8, 0.5)]
    for i, (x1, y1, x2, y2) in enumerate(gts):
        images[i, int(y1 * 64):int(y2 * 64), int(x1 * 64):int(x2 * 64)] \
            += 150.0
        boxes[i, 0] = (x1, y1, x2, y2)
        labels[i, 0] = 7
    batch = shard_batch((images, boxes, labels), mesh)

    losses = []
    for it in range(150):
        state, m = step(state, *batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.3 * losses[0], losses[::30]

    out = eval_fn(state.params, state.batch_stats, jnp.asarray(images))
    det = np.asarray(out["rows"] if isinstance(out, dict) else out)
    hits = 0
    for i, (x1, y1, x2, y2) in enumerate(gts):
        rows = det[i]
        rows = rows[rows[:, 0] > 0.2]
        best_iou = 0.0
        for r in rows:
            if int(r[5]) != 8:  # class 7 + background offset
                continue
            ix1, iy1 = max(r[1], x1), max(r[2], y1)
            ix2, iy2 = min(r[3], x2), min(r[4], y2)
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            union = ((r[3] - r[1]) * (r[4] - r[2])
                     + (x2 - x1) * (y2 - y1) - inter)
            best_iou = max(best_iou, inter / union)
        if best_iou > 0.5:
            hits += 1
    assert hits >= 3, "only {}/4 objects localized after overfit".format(
        hits)
