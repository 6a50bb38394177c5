"""Pallas NMS kernel parity vs the lax implementation (interpret mode on
the CPU test mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odtpu.ops.detect import detect_out
from odtpu.ops.nms import _greedy_mask


def _rand_scene(rng, B=2, P=80, C=6):
    priors = np.stack([
        rng.uniform(0.2, 0.8, P), rng.uniform(0.2, 0.8, P),
        rng.uniform(0.1, 0.3, P), rng.uniform(0.1, 0.3, P)], 1
    ).astype(np.float32)
    loc = (rng.randn(B, P, 4) * 0.1).astype(np.float32)
    logits = rng.randn(B, P, C).astype(np.float32)
    conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return priors, loc, conf


def test_pallas_mask_matches_lax(rng):
    from odtpu.ops.pallas import nms_kernel as nk
    import jax.experimental.pallas as pl

    # interpret mode for CPU execution
    orig = pl.pallas_call
    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)
    nk.pl.pallas_call = patched
    try:
        N, K = 6, 50
        xy1 = rng.uniform(0, 0.7, (N, K, 2)).astype(np.float32)
        wh = rng.uniform(0.05, 0.3, (N, K, 2)).astype(np.float32)
        boxes = np.concatenate([xy1, xy1 + wh], -1)
        scores = -np.sort(-rng.rand(N, K).astype(np.float32), axis=1)
        got = np.asarray(nk.nms_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.01))
        for i in range(N):
            want = np.asarray(_greedy_mask(jnp.asarray(boxes[i]),
                                           jnp.asarray(scores[i]),
                                           0.45, 0.01))
            np.testing.assert_array_equal(got[i], want)
    finally:
        nk.pl.pallas_call = orig


def test_padded_small_batch(rng):
    """Zero-score dummy sets appended on the batch axis (the production
    workaround for the composed-graph TPU fault, ops/detect.py
    _PALLAS_MIN_SETS) must not change the kept rows of the real sets."""
    from odtpu.ops.pallas import nms_kernel as nk
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)
    nk.pl.pallas_call = patched
    try:
        priors, loc, conf = _rand_scene(rng, B=1, P=80, C=6)
        from odtpu.ops.boxes import decode
        decoded = decode(jnp.asarray(loc), jnp.asarray(priors)[None],
                         (0.1, 0.2))
        conf_fg = jnp.asarray(conf)[..., 1:]
        base = nk.per_class_nms_pallas(decoded, conf_fg, 0.01, 0.45, 20)
        pad_b = 3  # 1 real + 3 dummy images = 20 sets at C-1=5
        dec_p = jnp.concatenate(
            [decoded, jnp.zeros((pad_b,) + decoded.shape[1:])], 0)
        conf_p = jnp.concatenate(
            [conf_fg, jnp.zeros((pad_b,) + conf_fg.shape[1:])], 0)
        padded = nk.per_class_nms_pallas(dec_p, conf_p, 0.01, 0.45, 20)
        np.testing.assert_array_equal(np.asarray(padded[:1]),
                                      np.asarray(base))
        # the dummy sets themselves keep nothing
        assert float(jnp.sum(jnp.abs(padded[1:]))) == 0.0
    finally:
        nk.pl.pallas_call = orig


def test_pallas_detect_matches_lax(rng):
    from odtpu.ops.pallas import nms_kernel as nk
    import jax.experimental.pallas as pl
    orig = pl.pallas_call
    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)
    nk.pl.pallas_call = patched
    try:
        priors, loc, conf = _rand_scene(rng)
        a = detect_out(jnp.asarray(loc), jnp.asarray(conf),
                       jnp.asarray(priors), (0.1, 0.2), top_k=20,
                       impl="lax")
        b = detect_out(jnp.asarray(loc), jnp.asarray(conf),
                       jnp.asarray(priors), (0.1, 0.2), top_k=20,
                       impl="pallas")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    finally:
        nk.pl.pallas_call = orig


def test_compact_transport_skips_row_compaction(rng):
    """detect_out_compact's pallas route runs with compact_rows=False
    (the cross-class top-k re-ranks and masks by score, making the
    per-class survivors-first compaction redundant) — its output must
    be bit-identical to the lax route, score ties included."""
    from odtpu.ops.pallas import nms_kernel as nk
    import jax.experimental.pallas as pl
    from odtpu.ops.detect import detect_out_compact
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)
    nk.pl.pallas_call = patched
    try:
        priors, loc, conf = _rand_scene(rng, B=3, P=120, C=6)
        # force score ties within and across classes
        conf = (np.asarray(conf) * 50).round() / 50
        a = detect_out_compact(jnp.asarray(loc), jnp.asarray(conf),
                               jnp.asarray(priors), (0.1, 0.2),
                               top_k=25, impl="pallas")
        b = detect_out_compact(jnp.asarray(loc), jnp.asarray(conf),
                               jnp.asarray(priors), (0.1, 0.2),
                               top_k=25, impl="lax")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        nk.pl.pallas_call = orig
