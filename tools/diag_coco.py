#!/usr/bin/env python
"""Diagnose the COCO contract's near-zero mAP: restore the trained
checkpoint, run the real eval step on TRAIN images, and split the
failure between localization (IoU of best box per GT, label-agnostic)
and classification (argmax class on well-localized detections)."""
import numpy as np, os.path as osp, sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from odtpu.utils.config import load_cfg
cfg = load_cfg("weights/tests/coco_synth_r4/config_used.yml")
cfg.TPU.COMPUTE_DTYPE = "float32"
cfg.DATASET.NUM_WORKERS = 2
cfg.EVAL.CONF_THRESH = 0.01

from odtpu.models import model_factory
from odtpu.parallel import create_train_state, make_eval_step
model, priors, _ = model_factory("eval", cfg)
state, _ = create_train_state(model, cfg)
from odtpu.utils.checkpoint import restore_partial
step, params, batch_stats = restore_partial(
    "weights/tests/coco_synth_r4/ckpt", jax.device_get(state.params),
    jax.device_get(state.batch_stats))
print("restored step", step)

from odtpu.data import dataset_factory
loader = dataset_factory("eval", cfg)
ds = loader.dataset

eval_step = make_eval_step(model, priors, cfg)

def iou(a, b):
    ix1 = np.maximum(a[0], b[:, 0]); iy1 = np.maximum(a[1], b[:, 1])
    ix2 = np.minimum(a[2], b[:, 2]); iy2 = np.minimum(a[3], b[:, 3])
    iw = np.clip(ix2 - ix1, 0, None); ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    ua = (a[2]-a[0])*(a[3]-a[1]) + (b[:,2]-b[:,0])*(b[:,3]-b[:,1]) - inter
    return inter / np.maximum(ua, 1e-9)

n_gt = 0; loc_hits = 0; cls_hits_on_loc = 0; best_ious = []
scores_of_best = []
for bi, batch in enumerate(loader):
    if bi >= 4: break
    det = jax.device_get(eval_step(params, batch_stats, batch["images"]))
    if isinstance(det, dict): det = det["rows"]
    det = np.asarray(det)
    for b in range(det.shape[0]):
        rows = det[b]
        rows = rows[rows[:, 0] > 0.01]
        gt_valid = batch["labels"][b] >= 0
        gboxes = batch["boxes"][b][gt_valid]   # normalized
        glabels = batch["labels"][b][gt_valid]
        for g, gl in zip(gboxes, glabels):
            n_gt += 1
            if len(rows) == 0: continue
            ious = iou(g, rows[:, 1:5])
            j = int(ious.argmax())
            best_ious.append(float(ious[j]))
            scores_of_best.append(float(rows[j, 0]))
            if ious[j] >= 0.5:
                loc_hits += 1
                if int(rows[j, 5]) - 1 == int(gl):
                    cls_hits_on_loc += 1
print("GT boxes:", n_gt)
print("best-IoU>=0.5 (label-agnostic localization):",
      loc_hits, "/", n_gt, "=", loc_hits / max(n_gt, 1))
print("class correct on localized:", cls_hits_on_loc, "/", loc_hits,
      "=", cls_hits_on_loc / max(loc_hits, 1))
print("mean best IoU:", np.mean(best_ious))
print("mean score of best-IoU det:", np.mean(scores_of_best))
