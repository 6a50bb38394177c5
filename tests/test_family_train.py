"""Gradient/train-step coverage for the non-flagship families.

The at-scale training contract is proven on SSD300 (BENCH_NOTES) and
RefineDet320; these tests close the unit-level gap for the remaining
zoo members: FPN and FSSD train steps descend, and a DRN-backed SSD
exercises the BatchNorm batch_stats path (stat mutation under the
8-device mesh) that the BN-free VGG flagship never touches.
Reference train loop analogue: /root/reference/train.py:118-192.
"""

import jax
import numpy as np
import pytest

from odtpu.models import model_factory
from odtpu.parallel import (create_train_state, make_mesh, make_train_step,
                            shard_batch)
from odtpu.utils.config import default_cfg


def _tiny_cfg(ssd_type, base="vgg16"):
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SSD_TYPE = ssd_type
    cfg.MODEL.BASE = base
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    cfg.MODEL.MAX_SIZES = [16, 32, 48, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    cfg.DATASET.MAX_BOXES = 8
    cfg.TRAIN.OPTIMIZER.LR = 1e-3
    cfg.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 5.0
    return cfg


def _one_box_batch(rng, B, mesh):
    images = rng.rand(B, 64, 64, 3).astype(np.float32)
    boxes = np.tile(np.array([[[0.2, 0.2, 0.7, 0.7]]], np.float32),
                    (B, 8, 1))
    labels = np.full((B, 8), -1, np.int32)
    labels[:, 0] = 3
    return shard_batch((images, boxes, labels), mesh)


def _run_descends(cfg, rng, model=None, priors=None, steps=6):
    if model is None:
        model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    batch = _one_box_batch(rng, 8, mesh)
    losses = []
    for _ in range(steps):
        state, m = step(state, *batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    return state, losses


def test_fpn_train_step_descends(rng):
    _run_descends(_tiny_cfg("FPN"), rng)


def test_fssd_train_step_descends(rng):
    # FSSD's pyramid spec is fixed for 300-input in the factory
    # (fssd.FSSD300_PYRAMID); build the module directly with a 4-map
    # tiny pyramid (8/4/2/1 from a 64x64 input) on the same contract.
    import jax.numpy as jnp
    from odtpu.models import probe_layer_dims
    from odtpu.models.fssd import FSSD
    from odtpu.models.vgg import VGG16
    from odtpu.ops.priors import prior_factory

    cfg = _tiny_cfg("FSSD")
    prior = prior_factory(cfg)
    cfg.MODEL.NUM_PRIOR = prior.num_priors
    model = FSSD(backbone=VGG16(dtype=jnp.float32),
                 num_classes=cfg.MODEL.NUM_CLASSES,
                 num_priors=tuple(prior.num_priors),
                 pyramid_spec=((128, 1, 1), (128, 2, 1), (128, 2, 1),
                               (128, 2, 1)),
                 dtype=jnp.float32)
    dims = probe_layer_dims(model, cfg.MODEL.IMAGE_SIZE)
    assert dims == [(8, 8), (4, 4), (2, 2), (1, 1)]
    priors = jnp.asarray(prior(dims))
    _run_descends(cfg, rng, model=model, priors=priors)


def test_drn_ssd_train_step_updates_batch_stats(rng):
    """DRN-22 base under SSD: the only BatchNorm-carrying train path.

    Asserts descent AND that batch_stats actually mutate across steps
    (the running means move), i.e. mutable-collection threading through
    the sharded train step works.
    """
    cfg = _tiny_cfg("SSD", base="drn_d_22")
    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    assert state.batch_stats, "drn_d_22 must carry batch_stats"
    before = jax.device_get(
        jax.tree_util.tree_leaves(state.batch_stats)[0])
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    batch = _one_box_batch(rng, 8, mesh)
    losses = []
    for _ in range(6):
        state, m = step(state, *batch)
        losses.append(float(m["loss"]))
    after = jax.device_get(
        jax.tree_util.tree_leaves(state.batch_stats)[0])
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert not np.allclose(before, after), "batch_stats never updated"
