"""Observability: timers + TensorBoard writer wrapper.

Parity targets: Timer (reference lib/utils/utils.py:12) and TBWriter
(lib/utils/visualize_utils.py:8) — scalars for loc/conf/total loss and
step time every LOG_LOSS_ITER, mAP per eval, per-class PR curves.
TensorBoard comes from torch.utils.tensorboard (cpu torch is in the
image); everything degrades to no-ops when it's unavailable.
"""

from __future__ import annotations

import time


class Timer:
    """tic/toc accumulator (reference utils.py:12-34)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average=True):
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff


class TBWriter:
    """Thin tensorboard wrapper carrying a mutable context dict
    (phase/epoch/iteration), like the reference TBWriter."""

    def __init__(self, log_dir, cfg=None):
        self.cfg = dict(cfg or {})
        self.writer = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except Exception as e:  # pragma: no cover
                print("tensorboard unavailable:", e)

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), int(step))

    def add_scalars(self, prefix, scalars, step):
        for k, v in scalars.items():
            self.add_scalar("{}/{}".format(prefix, k), v, step)

    def add_image(self, tag, img_hwc, step):
        if self.writer is not None:
            self.writer.add_image(tag, img_hwc, int(step),
                                  dataformats="HWC")

    def add_pr_curves(self, res, step=0):
        """res: [(cls, ap, prec, rec)] from the VOC evaluator."""
        if self.writer is None:
            return
        import numpy as np
        for cls, ap, prec, rec in res:
            if not hasattr(prec, "__len__"):
                continue
            n = len(prec)
            if n == 0:
                continue
            self.writer.add_pr_curve_raw(
                "pr/{}".format(cls),
                true_positive_counts=np.zeros(n),
                false_positive_counts=np.zeros(n),
                true_negative_counts=np.zeros(n),
                false_negative_counts=np.zeros(n),
                precision=np.asarray(prec),
                recall=np.asarray(rec),
                global_step=step, num_thresholds=n)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
