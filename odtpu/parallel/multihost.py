"""Multi-host helpers: gathering variable-length host-side results.

The reference is single-process (torch DataParallel, train.py:62) so it
never needed this; odtpu shards the *eval* dataset across processes
(odtpu/data/__init__.py) and each host evaluates its slice with local
devices — embarrassingly parallel, no collectives inside the loop —
then detection rows are all-gathered host-side once at the end so every
process can compute the identical global mAP.
"""

from __future__ import annotations

import numpy as np


def allgather_host_rows(rows: np.ndarray) -> np.ndarray:
    """All-gather a per-process [N_i, K] float array; returns the
    concatenation over processes in process-index order ([sum N_i, K]).

    Row counts may differ per process: counts are exchanged first and
    every contribution is padded to the max before the collective
    (jax.experimental.multihost_utils.process_allgather requires equal
    shapes). Single-process: identity.
    """
    import jax

    rows = np.asarray(rows, np.float32)
    if rows.ndim != 2:
        raise ValueError(f"expected [N, K] rows, got shape {rows.shape}")
    world = jax.process_count()
    if world == 1:
        return rows
    from jax.experimental import multihost_utils as mhu

    counts = mhu.process_allgather(
        np.asarray([rows.shape[0]], np.int32))  # [world, 1]
    counts = np.asarray(counts).reshape(world)
    m = int(counts.max())
    if m == 0:
        return rows[:0]
    pad = np.zeros((m - rows.shape[0], rows.shape[1]), np.float32)
    stacked = np.asarray(mhu.process_allgather(
        np.concatenate([rows, pad], axis=0)))  # [world, m, K]
    return np.concatenate(
        [stacked[r, : counts[r]] for r in range(world)], axis=0)
