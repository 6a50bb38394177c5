"""Matching + MultiBox loss tests: forced assignment, padding invariance,
mining count, permutation invariance."""

import numpy as np
import jax.numpy as jnp

from odtpu.ops.boxes import point_form
from odtpu.ops.matching import match, match_batch
from odtpu.layers.losses import multibox_loss

VARS = (0.1, 0.2)


def _pad(boxes, labels, g):
    G = boxes.shape[0]
    pb = np.zeros((g, 4), np.float32)
    pl = np.full((g,), -1, np.int64)
    pb[:G] = boxes
    pl[:G] = labels
    return jnp.asarray(pb), jnp.asarray(pl)


def test_match_forced_assignment():
    """A GT whose best prior overlaps < threshold must still be matched
    (overlap forced to 2.0)."""
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2],
                        [0.1, 0.1, 0.1, 0.1]], dtype=jnp.float32)
    # GT barely overlaps prior 0 (IoU < 0.5) and not prior 1 at all
    gt = np.array([[0.55, 0.55, 0.75, 0.75]], np.float32)
    labels = np.array([3], np.int64)
    b, l = _pad(gt, labels, 5)
    loc_t, conf_t, best_idx = match(b, l, priors, VARS, threshold=0.5)
    assert int(conf_t[0]) == 4  # label+1, forced despite low IoU
    assert int(best_idx[0]) == 0


def test_match_background_below_threshold():
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2],
                        [0.9, 0.9, 0.1, 0.1]], dtype=jnp.float32)
    gt = np.asarray(point_form(priors[:1]))  # exactly prior 0
    b, l = _pad(gt, np.array([7]), 5)
    _, conf_t, _ = match(b, l, priors, VARS, threshold=0.5)
    assert int(conf_t[0]) == 8
    assert int(conf_t[1]) == 0  # disjoint prior stays background


def test_match_padding_invariance(rng):
    """Result must not depend on the amount of padding."""
    priors = np.stack([
        rng.uniform(0.2, 0.8, 64), rng.uniform(0.2, 0.8, 64),
        rng.uniform(0.1, 0.3, 64), rng.uniform(0.1, 0.3, 64)
    ], 1).astype(np.float32)
    gt = np.array([[0.2, 0.2, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], np.float32)
    labels = np.array([2, 11])
    outs = []
    for g in (2, 10, 50):
        b, l = _pad(gt, labels, g)
        loc_t, conf_t, _ = match(b, l, jnp.asarray(priors), VARS, 0.5)
        outs.append((np.asarray(loc_t), np.asarray(conf_t)))
    for loc_t, conf_t in outs[1:]:
        np.testing.assert_allclose(loc_t, outs[0][0], atol=1e-6)
        np.testing.assert_array_equal(conf_t, outs[0][1])


def test_match_empty_gt_all_background():
    priors = jnp.array([[0.5, 0.5, 0.2, 0.2]], dtype=jnp.float32)
    b, l = _pad(np.zeros((0, 4), np.float32), np.zeros((0,), np.int64), 8)
    _, conf_t, _ = match(b, l, priors, VARS, 0.5)
    assert int(conf_t.sum()) == 0


def test_match_collision_last_gt_wins():
    """Two GTs whose best prior is the same: reference's sequential loop
    makes the LAST GT win (box_utils.py:126-127)."""
    priors = jnp.array([[0.5, 0.5, 0.4, 0.4]], dtype=jnp.float32)
    gt = np.array([[0.3, 0.3, 0.7, 0.7],
                   [0.31, 0.31, 0.71, 0.71]], np.float32)
    b, l = _pad(gt, np.array([1, 2]), 4)
    _, conf_t, best_idx = match(b, l, priors, VARS, 0.5)
    assert int(best_idx[0]) == 1  # last GT
    assert int(conf_t[0]) == 3


def _rand_scene(rng, B=2, G=6, P=128, C=21):
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)
    ], 1).astype(np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    labels = np.full((B, G), -1, np.int64)
    for i in range(B):
        n = rng.randint(1, G)
        xy1 = rng.uniform(0, 0.6, (n, 2))
        wh = rng.uniform(0.1, 0.4, (n, 2))
        boxes[i, :n] = np.concatenate([xy1, xy1 + wh], 1)
        labels[i, :n] = rng.randint(0, C - 1, n)
    loc = rng.randn(B, P, 4).astype(np.float32)
    conf = rng.randn(B, P, C).astype(np.float32)
    return priors, boxes, labels, loc, conf


def test_loss_mining_count(rng):
    """Negatives selected must be exactly min(3*num_pos, P-1) per image."""
    priors, boxes, labels, loc, conf = _rand_scene(rng)
    P = priors.shape[0]
    out = multibox_loss(jnp.asarray(loc), jnp.asarray(conf),
                        jnp.asarray(priors), jnp.asarray(boxes),
                        jnp.asarray(labels), VARS)
    # recompute mined CE by brute force in numpy
    loc_t, conf_t, _ = match_batch(jnp.asarray(boxes), jnp.asarray(labels),
                                   jnp.asarray(priors), VARS, 0.5)
    conf_t = np.asarray(conf_t)
    pos = conf_t > 0
    lse = np.log(np.exp(conf).sum(-1))
    ce = lse - np.take_along_axis(conf, conf_t[..., None], -1)[..., 0]
    total = 0.0
    for i in range(conf.shape[0]):
        npos = pos[i].sum()
        nneg = min(3 * npos, P - 1)
        neg_ce = np.where(pos[i], 0.0, ce[i])
        neg_idx = np.argsort(-neg_ce, kind="stable")[:nneg]
        total += ce[i][pos[i]].sum() + ce[i][neg_idx].sum()
    np.testing.assert_allclose(float(out.loss_conf_sum), total, rtol=1e-4)


def test_loss_gt_permutation_invariance(rng):
    priors, boxes, labels, loc, conf = _rand_scene(rng, B=1, G=5)
    perm = rng.permutation(5)
    # permute only the valid prefix consistently: permute all (pads map to pads)
    out1 = multibox_loss(jnp.asarray(loc), jnp.asarray(conf),
                         jnp.asarray(priors), jnp.asarray(boxes),
                         jnp.asarray(labels), VARS)
    out2 = multibox_loss(jnp.asarray(loc), jnp.asarray(conf),
                         jnp.asarray(priors), jnp.asarray(boxes[:, perm]),
                         jnp.asarray(labels[:, perm]), VARS)
    np.testing.assert_allclose(float(out1.loss_loc_sum),
                               float(out2.loss_loc_sum), rtol=1e-4)
    np.testing.assert_allclose(float(out1.loss_conf_sum),
                               float(out2.loss_conf_sum), rtol=1e-4)
    assert int(out1.num_pos) == int(out2.num_pos)


def test_loss_differentiable(rng):
    import jax
    priors, boxes, labels, loc, conf = _rand_scene(rng, B=1, G=4, P=64)

    def f(loc, conf):
        o = multibox_loss(loc, conf, jnp.asarray(priors), jnp.asarray(boxes),
                          jnp.asarray(labels), VARS)
        n = jnp.maximum(o.num_pos, 1)
        return (o.loss_loc_sum + o.loss_conf_sum) / n

    g_loc, g_conf = jax.grad(f, argnums=(0, 1))(jnp.asarray(loc),
                                                jnp.asarray(conf))
    assert np.isfinite(np.asarray(g_loc)).all()
    assert np.isfinite(np.asarray(g_conf)).all()
    assert float(jnp.abs(g_conf).sum()) > 0


def test_onehot_gather_exact(rng):
    """_gather_rows (one-hot MXU matmul) must equal the direct gather
    bit-for-bit — including awkward mantissas and the -1 label column.
    Also asserted on the real TPU (HIGHEST precision; DEFAULT's bf16
    pass would truncate)."""
    import jax
    from odtpu.ops.matching import _gather_rows

    rows = rng.randn(60, 5).astype(np.float32) * 1e3
    rows[3, 4] = -1.0  # padded-label value rides through the matmul
    idx = rng.randint(0, 60, (8732,)).astype(np.int32)
    out = jax.jit(_gather_rows)(jnp.asarray(rows), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), rows[idx])
