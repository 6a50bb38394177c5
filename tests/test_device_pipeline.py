"""Device-photometric training pipeline: loader emits uint8, the jitted
step distorts/normalizes on device and still descends."""

import numpy as np
import jax

from odtpu.data import SSDAugmentation, VOCDetection, DetLoader, \
    dataset_factory
from odtpu.models import model_factory
from odtpu.parallel import (create_train_state, make_mesh, make_train_step,
                            shard_batch)
from odtpu.utils.config import default_cfg, update_cfg
from synth import make_voc


def tiny_cfg():
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    cfg.MODEL.MAX_SIZES = [16, 32, 48, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [128, "S", 256, 64, "S", 128]
    cfg.DATASET.MAX_BOXES = 8
    cfg.DATASET.DEVICE_PHOTOMETRIC = True
    cfg.TRAIN.OPTIMIZER.LR = 1e-5
    return cfg


def test_loader_emits_uint8(tmp_path):
    make_voc(str(tmp_path / "VOCdevkit"), n_images=4, seed=11)
    ds = VOCDetection(str(tmp_path / "VOCdevkit"), (("2007", "test"),))
    t = SSDAugmentation((64, 64), device_photometric=True)
    loader = DetLoader(ds, t, batch_size=4, max_boxes=8, num_workers=1)
    b = next(iter(loader))
    assert b["images"].dtype == np.uint8
    assert b["images"].shape == (4, 64, 64, 3)


def test_device_photometric_train_descends(tmp_path, rng):
    make_voc(str(tmp_path / "VOCdevkit"), n_images=8, seed=12)
    cfg = tiny_cfg()
    update_cfg(cfg)
    cfg.MODEL.IMAGE_SIZE = (64, 64)  # update_cfg resets from DATASET
    cfg.DATASET.DATASET_DIR = str(tmp_path / "VOCdevkit")
    cfg.DATASET.TRAIN_SETS = (("2007", "test"),)
    cfg.DATASET.TRAIN_BATCH_SIZE = 8
    cfg.DATASET.NUM_WORKERS = 1

    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)

    loader = dataset_factory("train", cfg)
    losses = []
    for epoch in range(3):
        for batch in loader:
            assert batch["images"].dtype == np.uint8
            sharded = shard_batch((batch["images"], batch["boxes"],
                                   batch["labels"]), mesh)
            state, m = step(state, *sharded)
            losses.append(float(m["loss"]))
    assert len(losses) >= 3
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
