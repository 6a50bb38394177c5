"""Box math primitives — pure, fixed-shape JAX functions.

Functional parity with /root/reference/lib/layers/box_utils.py
(point_form:6, center_size:18, intersect:30, jaccard:51, IoG:72,
encode:201, decode:226, log_sum_exp:265) but written for XLA:
everything broadcasts over arbitrary leading batch dims, nothing
mutates in place, and there are no data-dependent shapes.

Conventions (same as the reference):
- "point form":  [x_min, y_min, x_max, y_max], usually normalized to [0,1]
- "center-size": [cx, cy, w, h]
- priors are center-size; ground truth is point form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def point_form(boxes: Array) -> Array:
    """center-size [..., 4] -> point form [..., 4]."""
    cxcy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)


def center_size(boxes: Array) -> Array:
    """point form [..., 4] -> center-size [..., 4]."""
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(maxs + mins) / 2, maxs - mins], axis=-1)


def area(boxes: Array) -> Array:
    """point-form box area, [..., N]."""
    wh = jnp.maximum(boxes[..., 2:] - boxes[..., :2], 0.0)
    return wh[..., 0] * wh[..., 1]


def intersect(box_a: Array, box_b: Array) -> Array:
    """Pairwise intersection area. [..., A, 4] x [..., B, 4] -> [..., A, B].

    Coordinates are unpacked BEFORE broadcasting so every intermediate
    is [..., A, B] with B on the TPU lane axis — the natural
    [..., A, B, 2] formulation puts the size-2 coordinate axis minor,
    which wastes lanes on every elementwise op. Standalone at
    [32, 60, 8732] this is ~3x less compute on a v5e (0.27 -> 0.09 ms
    net of tunnel RTT); inside the fused train step the win is small
    (~0.4 ms/step) because XLA already folds most of the layout cost.
    Per-element math is unchanged (same min/max/sub/clip/mul), so
    results are bit-identical (tests/test_reference_goldens.py).
    """
    ix = (jnp.minimum(box_a[..., :, None, 2], box_b[..., None, :, 2])
          - jnp.maximum(box_a[..., :, None, 0], box_b[..., None, :, 0]))
    iy = (jnp.minimum(box_a[..., :, None, 3], box_b[..., None, :, 3])
          - jnp.maximum(box_a[..., :, None, 1], box_b[..., None, :, 1]))
    return jnp.clip(ix, 0.0) * jnp.clip(iy, 0.0)


def jaccard(box_a: Array, box_b: Array) -> Array:
    """Pairwise IoU of point-form boxes. [..., A, 4] x [..., B, 4] -> [..., A, B]."""
    inter = intersect(box_a, box_b)
    area_a = ((box_a[..., 2] - box_a[..., 0]) * (box_a[..., 3] - box_a[..., 1]))
    area_b = ((box_b[..., 2] - box_b[..., 0]) * (box_b[..., 3] - box_b[..., 1]))
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / union


def iog(box_a: Array, box_b: Array) -> Array:
    """Elementwise intersection-over-ground-truth (repulsion loss term).

    [..., N, 4] x [..., N, 4] -> [..., N]; area(A ∩ B)/area(A).
    Reference: box_utils.py:72.
    """
    min_xy = jnp.maximum(box_a[..., :2], box_b[..., :2])
    max_xy = jnp.minimum(box_a[..., 2:], box_b[..., 2:])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    g = (box_a[..., 2] - box_a[..., 0]) * (box_a[..., 3] - box_a[..., 1])
    return inter / g


def encode(matched: Array, priors: Array, variances) -> Array:
    """Encode matched GT (point form) against priors (center-size) into
    variance-scaled regression targets. [..., N, 4] -> [..., N, 4].

    Keeps the reference's log eps quirk (log(wh_ratio + 1e-10),
    box_utils.py:220) so targets are bit-comparable.
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh + 1e-10) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: Array, priors: Array, variances) -> Array:
    """Inverse of :func:`encode`; returns point-form boxes.

    Reference: box_utils.py:226-244.
    """
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    mins = cxcy - wh / 2
    maxs = mins + wh
    return jnp.concatenate([mins, maxs], axis=-1)


def log_sum_exp(x: Array) -> Array:
    """Row-wise logsumexp over the last axis, keepdims — numerically stable
    per-prior softmax CE numerator (reference box_utils.py:265 subtracts a
    global max; mathematically identical)."""
    return jax.nn.logsumexp(x, axis=-1, keepdims=True)
