"""Model-zoo breadth tests: FSSD, FPN, RFBNet, DRN bases, DRN_SSD,
RefineDet — shapes, dims probing, train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odtpu.models import model_factory, init_model
from odtpu.models.refinedet import refinedet320_cfg
from odtpu.utils.config import default_cfg


def _cfg(ssd_type, base="vgg16", size=300):
    cfg = default_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.SSD_TYPE = ssd_type
    cfg.MODEL.BASE = base
    return cfg


def _forward(cfg, batch=1):
    model, priors, dims = model_factory("train", cfg)
    variables = init_model(model, cfg, batch_size=batch)
    h, w = cfg.MODEL.IMAGE_SIZE
    x = jnp.zeros((batch, h, w, 3), jnp.float32)
    out = model.apply(variables, x, phase="train", train=False)
    return model, priors, dims, out


def test_fpn300():
    cfg = _cfg("FPN")
    model, priors, dims, (loc, conf) = _forward(cfg)
    assert dims == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert loc.shape == (1, 8732, 4)
    assert conf.shape == (1, 8732, 21)


def test_fssd300():
    cfg = _cfg("FSSD")
    model, priors, dims, (loc, conf) = _forward(cfg)
    assert dims == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert loc.shape == (1, 8732, 4)


def test_rfbnet300():
    cfg = _cfg("RFBNet")
    # RFBNet300 anchor plan: 6 anchors on the first map too
    cfg.MODEL.ASPECT_RATIOS = [[2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]
    model, priors, dims, (loc, conf) = _forward(cfg)
    assert dims == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    P = sum(a * h * w for a, (h, w) in zip([6, 6, 6, 6, 4, 4], dims))
    assert loc.shape == (1, P, 4)


def test_drn_d_22_ssd300():
    cfg = _cfg("SSD", base="drn_d_22")
    model, priors, dims, (loc, conf) = _forward(cfg)
    # drn: layer6 at stride 8 (38), layer11 at stride 16 (19), extras
    assert dims == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
    assert loc.shape == (1, 8732, 4)


def test_drnssd():
    cfg = _cfg("DRN_SSD", base="drn_d_22")
    # 6 heads on dilated stages: dims mostly 38/19 (no pyramid) — probe
    # must measure them, priors follow
    model, priors, dims = model_factory("train", cfg)
    assert len(dims) == 6
    assert dims[0] == (38, 38)
    variables = init_model(model, cfg)
    loc, conf = model.apply(variables, jnp.zeros((1, 300, 300, 3)),
                            phase="train", train=False)
    assert loc.shape[1] == priors.shape[0]


def test_refinedet320():
    cfg = refinedet320_cfg(_cfg("RefineDet"))
    model, priors, dims = model_factory("train", cfg)
    assert dims == [(40, 40), (20, 20), (10, 10), (5, 5)]
    assert cfg.MODEL.NUM_PRIOR == [3, 3, 3, 3]
    P = sum(3 * h * w for (h, w) in dims)
    assert priors.shape == (P, 4)
    variables = init_model(model, cfg)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    arm_loc, arm_conf, odm_loc, odm_conf = model.apply(
        variables, x, phase="train", train=False)
    assert arm_loc.shape == (1, P, 4)
    assert arm_conf.shape == (1, P, 2)
    assert odm_conf.shape == (1, P, 21)


def test_refinedet_loss_and_detect(rng):
    from odtpu.layers.losses import refinedet_loss
    from odtpu.ops.detect import detect_refine
    P, C, G, B = 128, 21, 5, 2
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    arm_loc = (rng.randn(B, P, 4) * 0.05).astype(np.float32)
    arm_conf = rng.randn(B, P, 2).astype(np.float32)
    odm_loc = (rng.randn(B, P, 4) * 0.05).astype(np.float32)
    odm_conf = rng.randn(B, P, C).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int64)
    for i in range(B):
        xy = rng.uniform(0, 0.5, (2, 2))
        wh = rng.uniform(0.2, 0.4, (2, 2))
        boxes[i, :2] = np.concatenate([xy, xy + wh], 1)
        labels[i, :2] = rng.randint(0, 20, 2)

    out = refinedet_loss(jnp.asarray(arm_loc), jnp.asarray(arm_conf),
                         jnp.asarray(odm_loc), jnp.asarray(odm_conf),
                         jnp.asarray(priors), jnp.asarray(boxes),
                         jnp.asarray(labels), (0.1, 0.2))
    assert np.isfinite(float(out.arm.loss_loc_sum))
    assert np.isfinite(float(out.odm.loss_conf_sum))
    assert int(out.arm.num_pos) > 0

    # grads flow to all four outputs
    def total(al, ac, ol, oc):
        r = refinedet_loss(al, ac, ol, oc, jnp.asarray(priors),
                           jnp.asarray(boxes), jnp.asarray(labels),
                           (0.1, 0.2))
        return (r.arm.loss_loc_sum + r.arm.loss_conf_sum
                + r.odm.loss_loc_sum + r.odm.loss_conf_sum)
    grads = jax.grad(total, argnums=(0, 1, 2, 3))(
        jnp.asarray(arm_loc), jnp.asarray(arm_conf),
        jnp.asarray(odm_loc), jnp.asarray(odm_conf))
    for g in grads:
        assert float(jnp.abs(g).sum()) > 0

    # two-step detect: softmaxed confs
    sm = lambda z: np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    det = detect_refine(jnp.asarray(arm_loc), jnp.asarray(sm(arm_conf)),
                        jnp.asarray(odm_loc), jnp.asarray(sm(odm_conf)),
                        jnp.asarray(priors), (0.1, 0.2), top_k=50)
    assert det.shape == (B, 50, 6)
    assert np.isfinite(np.asarray(det)).all()


def test_refinedet_ignore_excluded_from_matching(rng):
    """ARM bg prob > 0.99 removes an anchor from the ODM entirely —
    from matching (its never-trained refined box must not become a
    'positive' whose features see background, nor steal a GT from a
    genuine anchor in the forced-bipartite step), from the positive
    set, and from the mining pool. Root-caused on the first at-scale
    contract run (ODM argmax accuracy 12.5% after 6k iters,
    BENCH_NOTES round-3)."""
    from odtpu.layers.losses import refinedet_loss
    P, C, B = 64, 21, 1
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    boxes = np.array([[[0.2, 0.2, 0.6, 0.6]]], np.float32)
    labels = np.array([[4]], np.int64)

    # (1) ARM extremely confident background everywhere -> the ODM sees
    # no anchors at all: zero positives, zero conf loss
    arm_conf = np.zeros((B, P, 2), np.float32)
    arm_conf[..., 0] = 20.0
    out = refinedet_loss(jnp.zeros((B, P, 4)), jnp.asarray(arm_conf),
                         jnp.zeros((B, P, 4)),
                         jnp.asarray(rng.randn(B, P, C).astype(np.float32)),
                         jnp.asarray(priors), jnp.asarray(boxes),
                         jnp.asarray(labels), (0.1, 0.2))
    assert int(out.odm.num_pos) == 0
    assert float(out.odm.loss_conf_sum) == 0.0
    assert int(out.arm.num_pos) > 0  # ARM itself still matches

    # (2) anti-stealing: anchor 0 sits exactly on the GT but is
    # ARM-ignored; anchor 1 overlaps at IoU 0.49 — BELOW the 0.5
    # threshold, so it can only become positive through the forced-
    # bipartite step. With anchor 0 in the match the force would go to
    # anchor 0 (to be dropped later: zero positives, the starvation
    # pattern); excluded from matching, the GT falls to the genuine
    # anchor 1 (exactly one positive).
    pri2 = np.tile(np.array([[0.9, 0.9, 0.05, 0.05]], np.float32), (P, 1))
    pri2[0] = [0.4, 0.4, 0.4, 0.4]     # dead-on the GT, but ignored
    pri2[1] = [0.4, 0.4, 0.28, 0.28]   # genuine candidate, IoU 0.49
    arm_conf2 = np.zeros((B, P, 2), np.float32)
    arm_conf2[:, 0, 0] = 20.0         # only anchor 0 is bg-confident
    out2 = refinedet_loss(jnp.zeros((B, P, 4)), jnp.asarray(arm_conf2),
                          jnp.zeros((B, P, 4)),
                          jnp.asarray(rng.randn(B, P, C).astype(np.float32)),
                          jnp.asarray(pri2), jnp.asarray(boxes),
                          jnp.asarray(labels), (0.1, 0.2))
    assert int(out2.odm.num_pos) == 1


def test_refinedet_train_step(rng):
    """Full RefineDet train step descends on a tiny input."""
    from odtpu.parallel import (create_train_state, make_mesh,
                                make_train_step, shard_batch)
    cfg = refinedet320_cfg(_cfg("RefineDet"))
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    cfg.DATASET.MAX_BOXES = 8
    model, priors, dims = model_factory("train", cfg)
    mesh = make_mesh(cfg)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step = make_train_step(model, priors, cfg, tx, mesh=mesh)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)
    boxes = np.tile(np.array([[[0.2, 0.2, 0.7, 0.7]]], np.float32),
                    (8, 8, 1))
    labels = np.full((8, 8), -1, np.int32)
    labels[:, 0] = 3
    batch = shard_batch((images, boxes, labels), mesh)
    losses = []
    # 12 steps with a halving criterion: the ODM-norm'd model (L2Norm
    # on TCB outputs) descends 39 -> ~3 over 14 steps but momentum
    # overshoots transiently around steps 3-4, which a 5-step
    # last<first check misreads as non-descent.
    for _ in range(12):
        state, m = step(state, *batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < 0.5 * losses[0], losses


def test_refinedet_loss_stable_at_raw_init_scale(rng):
    """From-scratch nets at raw-pixel input scale emit |arm_loc| ~ 1e3
    at init (measured 844 on the real model). Unclamped, exp(loc*v)
    makes inf-area refined anchors whose -inf encode targets reach the
    ODM loss through a forced match: the round-3 unclamped training run
    NaN'd from step 1 (loss finite, GRADIENT inf -> clip_by_global_norm
    scales by clip/inf -> NaN weights). The BBOX_XFORM_CLIP clamp in
    refinedet_loss must keep loss AND grads finite at this scale."""
    from odtpu.layers.losses import refinedet_loss
    P, C, G, B = 128, 21, 5, 2
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    arm_loc = (rng.randn(B, P, 4) * 400).astype(np.float32)  # raw scale
    arm_conf = (rng.randn(B, P, 2) * 100).astype(np.float32)
    odm_loc = (rng.randn(B, P, 4) * 400).astype(np.float32)
    odm_conf = (rng.randn(B, P, C) * 100).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int64)
    for i in range(B):
        xy = rng.uniform(0, 0.5, (2, 2))
        wh = rng.uniform(0.2, 0.4, (2, 2))
        boxes[i, :2] = np.concatenate([xy, xy + wh], 1)
        labels[i, :2] = rng.randint(0, 20, 2)

    def total(al, ac, ol, oc):
        r = refinedet_loss(al, ac, ol, oc, jnp.asarray(priors),
                           jnp.asarray(boxes), jnp.asarray(labels),
                           (0.1, 0.2))
        return (r.arm.loss_loc_sum + r.arm.loss_conf_sum
                + r.odm.loss_loc_sum + r.odm.loss_conf_sum)
    args = (jnp.asarray(arm_loc), jnp.asarray(arm_conf),
            jnp.asarray(odm_loc), jnp.asarray(odm_conf))
    loss = total(*args)
    assert np.isfinite(float(loss)), float(loss)
    grads = jax.grad(total, argnums=(0, 1, 2, 3))(*args)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_refinedet_warm_phase_is_plain_multibox(rng):
    """cfg.LOSS.ODM_MATCH_WARM_ITERS contract: with use_refined=False
    the ODM branch must be EXACTLY a plain SSD multibox loss on the raw
    anchor grid — same matching, no negative-anchor filtering — so the
    warm phase trains the conf head on stable targets (the from-scratch
    failure mode this knob exists for is documented in refinedet_loss).
    Traced-scalar use_refined must give the same result as the Python
    bool (train.py passes `state.step >= warm` through jit)."""
    from odtpu.layers.losses import refinedet_loss, multibox_loss
    P, C, G, B = 128, 21, 5, 2
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    arm_loc = (rng.randn(B, P, 4) * 0.05).astype(np.float32)
    arm_conf = rng.randn(B, P, 2).astype(np.float32)
    odm_loc = (rng.randn(B, P, 4) * 0.05).astype(np.float32)
    odm_conf = rng.randn(B, P, C).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int64)
    for i in range(B):
        xy = rng.uniform(0, 0.5, (2, 2))
        wh = rng.uniform(0.2, 0.4, (2, 2))
        boxes[i, :2] = np.concatenate([xy, xy + wh], 1)
        labels[i, :2] = rng.randint(0, 20, 2)
    args = (jnp.asarray(arm_loc), jnp.asarray(arm_conf),
            jnp.asarray(odm_loc), jnp.asarray(odm_conf),
            jnp.asarray(priors), jnp.asarray(boxes), jnp.asarray(labels),
            (0.1, 0.2))

    warm = refinedet_loss(*args, use_refined=False)
    plain = multibox_loss(jnp.asarray(odm_loc), jnp.asarray(odm_conf),
                          jnp.asarray(priors), jnp.asarray(boxes),
                          jnp.asarray(labels), (0.1, 0.2))
    assert float(warm.odm.loss_loc_sum) == float(plain.loss_loc_sum)
    assert float(warm.odm.loss_conf_sum) == float(plain.loss_conf_sum)
    assert int(warm.odm.num_pos) == int(plain.num_pos)
    # ARM branch is unaffected by the warm switch
    ref = refinedet_loss(*args, use_refined=True)
    assert float(warm.arm.loss_conf_sum) == float(ref.arm.loss_conf_sum)
    # refined-phase ODM differs (the switch actually switches)
    assert float(ref.odm.loss_conf_sum) != float(plain.loss_conf_sum)
    # traced scalar == python bool on both sides of the switch
    jitted = jax.jit(lambda u: refinedet_loss(*args, use_refined=u))
    for u, want in ((False, warm), (True, ref)):
        got = jitted(jnp.asarray(u))
        assert float(got.odm.loss_conf_sum) == float(want.odm.loss_conf_sum)
        assert float(got.odm.loss_loc_sum) == float(want.odm.loss_loc_sum)


def test_refinedet_zero_init_is_implicit_curriculum(rng):
    """The final contract config trains with ODM_MATCH_WARM_ITERS=0 and
    relies on this invariant instead: arm_loc heads are ZERO-initialized
    (models/refinedet.py), so at init the refined anchors equal the raw
    prior grid exactly and the paper-mode ODM loss (use_refined=True)
    degenerates to a plain SSD multibox loss — no distribution cliff,
    targets drift only as fast as the ARM learns. Two pins:

    1. model: a freshly initialized RefineDet emits arm_loc == 0.
    2. loss: with arm_loc == 0 and an undecided ARM (logits 0 ->
       P(bg)=0.5 < the 0.99 filter), refinedet_loss(use_refined=True)'s
       ODM branch matches multibox_loss on the raw priors to float
       round-trip tolerance (decode->center_size of zero offsets)."""
    from odtpu.layers.losses import multibox_loss, refinedet_loss

    # --- pin 1: zero-init arm_loc on the real (tiny) model ---
    cfg = refinedet320_cfg(_cfg("RefineDet"))
    cfg.DATASET.IMAGE_SIZE = (64, 64)
    cfg.MODEL.IMAGE_SIZE = (64, 64)
    cfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    model, priors_m, _ = model_factory("train", cfg)
    variables = init_model(model, cfg)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    arm_loc, _, _, _ = model.apply(variables, x, phase="train",
                                   train=False)
    assert float(jnp.abs(arm_loc).max()) == 0.0

    # --- pin 2: loss-level degeneration to plain multibox ---
    P, C, G, B = 128, 21, 5, 2
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    odm_loc = (rng.randn(B, P, 4) * 0.05).astype(np.float32)
    odm_conf = rng.randn(B, P, C).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int64)
    for i in range(B):
        xy = rng.uniform(0, 0.5, (2, 2))
        wh = rng.uniform(0.2, 0.4, (2, 2))
        boxes[i, :2] = np.concatenate([xy, xy + wh], 1)
        labels[i, :2] = rng.randint(0, 20, 2)

    out = refinedet_loss(
        jnp.zeros((B, P, 4)), jnp.zeros((B, P, 2)),
        jnp.asarray(odm_loc), jnp.asarray(odm_conf),
        jnp.asarray(priors), jnp.asarray(boxes), jnp.asarray(labels),
        (0.1, 0.2), use_refined=True)
    plain = multibox_loss(
        jnp.asarray(odm_loc), jnp.asarray(odm_conf), jnp.asarray(priors),
        jnp.asarray(boxes), jnp.asarray(labels), (0.1, 0.2))
    np.testing.assert_allclose(float(out.odm.loss_conf_sum),
                               float(plain.loss_conf_sum), rtol=1e-5)
    np.testing.assert_allclose(float(out.odm.loss_loc_sum),
                               float(plain.loss_loc_sum), rtol=1e-4)
    assert int(out.odm.num_pos) == int(plain.num_pos)
