"""bf16 numeric coverage: the shipped default (TPU.COMPUTE_DTYPE =
'bfloat16', odtpu/utils/config.py) was previously exercised only by
benchmarks; these tests pin it down on the CPU mesh — training descends
in bf16, parameters/losses stay f32 at the boundaries, and the bf16
detect path agrees with f32 within a stated tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from odtpu.models import model_factory
from odtpu.parallel import (create_train_state, make_eval_step, make_mesh,
                            make_train_step, shard_batch)
from odtpu.utils.config import default_cfg


def bf16_cfg():
    cfg = default_cfg()
    assert cfg.TPU.COMPUTE_DTYPE == "bfloat16"  # the shipped default
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [12, 24, 40, 56]
    cfg.MODEL.MAX_SIZES = [24, 40, 56, 64]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    cfg.MODEL.EXTRAS = [64, "S", 128, 64, "S", 128]
    cfg.DATASET.MAX_BOXES = 4
    return cfg


def _one_box_batch(rng, B=4):
    images = rng.rand(B, 64, 64, 3).astype(np.float32) * 50
    boxes = np.zeros((B, 4, 4), np.float32)
    labels = np.full((B, 4), -1, np.int32)
    gts = [(0.2, 0.2, 0.6, 0.6), (0.4, 0.4, 0.9, 0.9),
           (0.1, 0.5, 0.5, 0.9), (0.3, 0.1, 0.8, 0.5)]
    for i in range(B):
        x1, y1, x2, y2 = gts[i % len(gts)]
        images[i, int(y1 * 64):int(y2 * 64), int(x1 * 64):int(x2 * 64)] \
            += 150.0
        boxes[i, 0] = (x1, y1, x2, y2)
        labels[i, 0] = 7
    return images, boxes, labels


def test_bf16_train_descends(rng):
    """~20 steps of the bf16 train step on a fixed batch: finite,
    descending loss; params and reported losses remain float32 (bf16 is
    the COMPUTE dtype only — master weights and loss sums are f32)."""
    cfg = bf16_cfg()
    cfg.TRAIN.OPTIMIZER.LR = 5e-4
    cfg.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 5.0
    model, priors, _ = model_factory("train", cfg)
    mesh = make_mesh(cfg, devices=jax.devices()[:1])
    state, tx = create_train_state(model, cfg, rng=jax.random.PRNGKey(0),
                                   mesh=mesh)
    # master params are f32 regardless of compute dtype
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    batch = shard_batch(_one_box_batch(rng), mesh)
    losses = []
    for _ in range(20):
        state, m = step(state, *batch)
        losses.append(float(m["loss"]))
    assert m["loss"].dtype == jnp.float32  # loss accumulated in f32
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < 0.7 * losses[0], losses[::5]
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))


def test_bf16_detect_matches_f32(rng):
    """The bf16 eval step's detections agree with f32 on the same
    weights: same top-1 class per image, score within 0.02, box corners
    within 0.01 (normalized coords). bf16 has ~8 mantissa bits, so
    logits agree to ~1e-2 relative — the NMS/decode contract must not
    amplify that."""
    cfg32 = bf16_cfg()
    cfg32.TPU.COMPUTE_DTYPE = "float32"
    cfg32.TRAIN.OPTIMIZER.LR = 5e-4
    cfg32.TRAIN.OPTIMIZER.CLIP_GRAD_NORM = 5.0
    model32, priors, _ = model_factory("eval", cfg32)
    mesh = make_mesh(cfg32, devices=jax.devices()[:1])
    state, tx = create_train_state(model32, cfg32,
                                   rng=jax.random.PRNGKey(2), mesh=mesh)
    # random-init loc heads decode through exp() to unbounded garbage
    # boxes where bf16 noise is amplified arbitrarily; a briefly-trained
    # model gives the comparison meaningful, in-range detections
    images_np, boxes, labels = _one_box_batch(rng, B=4)
    step = make_train_step(model32, priors, cfg32, tx, mesh=mesh)
    batch = shard_batch((images_np, boxes, labels), mesh)
    for _ in range(60):
        state, m = step(state, *batch)
    assert np.isfinite(float(m["loss"]))

    cfg16 = bf16_cfg()
    model16, priors16, _ = model_factory("eval", cfg16)
    np.testing.assert_array_equal(np.asarray(priors), np.asarray(priors16))

    images = jnp.asarray(images_np)
    out32 = make_eval_step(model32, priors, cfg32, mesh=mesh)(
        state.params, state.batch_stats, images)
    out16 = make_eval_step(model16, priors, cfg16, mesh=mesh)(
        state.params, state.batch_stats, images)
    r32 = np.asarray(out32["rows"] if isinstance(out32, dict) else out32)
    r16 = np.asarray(out16["rows"] if isinstance(out16, dict) else out16)
    assert r32.shape == r16.shape
    # top-scoring row per image (rows are [B, N, 6] score,x1,y1,x2,y2,cls
    # for compact transport or [B, C, K, 5] dense — normalize access)
    def _iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ar = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1])
        return inter / max(ar - inter, 1e-9)

    def _check(a, c):
        # stated tolerance: same class, score within 0.02, boxes IoU
        # >= 0.8 with corners within 0.05 normalized (bf16's ~8 mantissa
        # bits through the conv stack + exp decode)
        np.testing.assert_allclose(a[0], c[0], atol=0.02)
        assert _iou(a[1:5], c[1:5]) >= 0.8, (a, c)
        np.testing.assert_allclose(a[1:5], c[1:5], atol=0.05)

    if r32.ndim == 3:  # compact [B, N, 6] score,x1,y1,x2,y2,cls
        for b in range(r32.shape[0]):
            i32, i16 = np.argmax(r32[b, :, 0]), np.argmax(r16[b, :, 0])
            a, c = r32[b, i32], r16[b, i16]
            assert a[5] == c[5], (a, c)                    # same class
            _check(a[:5], c[:5])
    else:  # dense [B, C, K, 5]
        for b in range(r32.shape[0]):
            f32_flat = r32[b].reshape(-1, 5)
            f16_flat = r16[b].reshape(-1, 5)
            i32, i16 = (np.argmax(f32_flat[:, 0]),
                        np.argmax(f16_flat[:, 0]))
            assert i32 // r32.shape[2] == i16 // r16.shape[2]  # class
            _check(f32_flat[i32], f16_flat[i16])
