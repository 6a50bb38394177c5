"""Exact two-level top-k, tuned for the detect path's tall-K selects.

`jax.lax.top_k` over the detect path's [B*C, num_priors] score matrix
(e.g. [640, 8732] for an SSD300 eval batch) lowers to a sort over the
full prior axis and costs ~9 ms on a v5e — a material slice of the
~32 ms fused eval step. Splitting the axis into G contiguous groups,
taking a per-group top-k, then a top-k over the G*k survivors cuts the
sorted volume ~an order of magnitude (measured 2.1x end-to-end at
G=16 for the SSD300 shape) while staying EXACT, ties included:

- any element in the global top-k must be in its own group's top-k
  (at most k winners exist in total, so at most k come from one group);
- `lax.top_k` breaks value ties by smaller index, and groups are
  contiguous index ranges, so the per-group stage keeps exactly the
  smaller-index copies a global select would keep, and the concat
  order of stage-2 equals original index order.

The reference reaches the same contract through a full descending sort
per candidate set (lib/layers/box_utils.py:294-296); this module is the
TPU-shaped equivalent of that sort's top-k prefix.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# empirical sweet spot on v5e for k=200-sized selects: groups of ~550
# elements (G=16 at P=8732). Larger groups under-split the sort; much
# smaller ones make stage 2 dominate.
_TARGET_GROUP = 512


def top_k_exact(x: jax.Array, k: int,
                groups: int | None = None) -> tuple[jax.Array, jax.Array]:
    """Drop-in `lax.top_k(x, k)` with identical values/indices/ties.

    x: [..., n]. Returns (values [..., k], indices [..., k]).
    Falls back to flat `lax.top_k` when splitting cannot win.
    ``groups`` overrides the group-count heuristic (tools/sweep_topk.py
    measures the sweet spot per shape on hardware).
    """
    n = x.shape[-1]
    k = int(k)
    # need per-group top-k >= k elements per group and enough groups to
    # beat the flat sort; below ~4 groups the two stages cost more
    if groups is None:
        # trace-time override for hardware A/Bs (0 = flat lax.top_k):
        # lets tools/profile_eval.py time the REAL detect graph under
        # either strategy without a code edit
        env = os.environ.get("ODTPU_TOPK_GROUPS")
        if env is not None:
            groups = int(env)
        else:
            groups = max(1, round(n / max(2 * k + 128, _TARGET_GROUP)))
    if groups < 4 or n < groups * k:
        return jax.lax.top_k(x, k)
    g = -(-n // groups)
    pad = groups * g - n
    lead = x.shape[:-1]
    xp = x
    if pad:
        # pad at the global end: pads have the largest indices, so tie
        # resolution (smaller index wins) can never prefer them
        xp = jnp.pad(x.reshape(-1, n), ((0, 0), (0, pad)),
                     constant_values=-jnp.inf)
    xg = xp.reshape(-1, groups, g)
    v1, i1 = jax.lax.top_k(xg, k)  # [N, G, k]
    gidx = i1 + (jnp.arange(groups, dtype=i1.dtype) * g)[None, :, None]
    v2, i2 = jax.lax.top_k(v1.reshape(-1, groups * k), k)
    idx = jnp.take_along_axis(gidx.reshape(-1, groups * k), i2, axis=1)
    return v2.reshape(*lead, k), idx.reshape(*lead, k)
