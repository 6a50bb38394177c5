"""Anchor (prior box) generation.

Parity target: /root/reference/lib/layers/functions/prior_box.py
(PriorBoxBase:20, PriorBoxSSD:114). Anchors are generated once at model
build time on the host with numpy (they are constants folded into the
compiled program), in center-size form, normalized coordinates.

Per-cell anchor recipe for feature map k (prior_box.py:122-143):
  - a square of side MIN_SIZES[k]
  - a square of side sqrt(MIN_SIZES[k] * MAX_SIZES[k])    (if MAX_SIZES)
  - for each aspect ratio ar: a (w*sqrt(ar), h/sqrt(ar)) rectangle,
    plus the flipped one when FLIP.
Grid centers: cx = (j + 0.5) / (image_w / STEPS[k]) — i.e. steps are in
input pixels.

Quirk kept (configurable): the reference clamps the *center-size* tensor
to [0,1] when CLIP is set (prior_box.py:108-110, acknowledged odd there);
mAP parity requires reproducing it, so `clip_mode='center_size'` is the
default, with 'point' as the fixed alternative and 'none' to disable.
"""

from __future__ import annotations

import math
from itertools import product

import numpy as np


class PriorBoxSSD:
    """SSD prior-box generator.

    Usage:
        p = PriorBoxSSD(cfg)
        p.num_priors            # anchors per cell for each feature map
        priors = p(layer_dims)  # np.float32 [sum(H_k*W_k*A_k), 4] center-size
    """

    def __init__(self, cfg):
        m = cfg.MODEL
        self.image_size = tuple(m.IMAGE_SIZE)  # (h, w)
        self.steps = list(m.STEPS)
        self.min_sizes = list(m.MIN_SIZES)
        self.max_sizes = list(m.MAX_SIZES)
        self.aspect_ratios = [list(a) for a in m.ASPECT_RATIOS]
        self.flip = bool(m.FLIP)
        self.clip = bool(m.CLIP)
        self.clip_mode = "center_size" if self.clip else "none"
        self.variance = list(m.VARIANCE)
        if any(v <= 0 for v in self.variance):
            raise ValueError("Variances must be greater than 0")
        n = len(self.steps)
        for name, lst in (("MIN_SIZES", self.min_sizes),
                          ("MAX_SIZES", self.max_sizes),
                          ("ASPECT_RATIOS", self.aspect_ratios)):
            if len(lst) != n and len(lst) != 0:
                raise ValueError(
                    "config {} length {} does not match STEPS length {}".format(
                        name, len(lst), n))

    # ------------------------------------------------------------------
    @property
    def num_priors(self):
        """Anchors per cell for each feature map, computed analytically
        (reference probes _create_prior(0,0,k), prior_box.py:47-50)."""
        return [len(self._cell_priors(0.0, 0.0, k)) for k in range(len(self.steps))]

    def _cell_priors(self, cx, cy, k):
        """All anchors for one grid cell of feature map k, center-size."""
        img_h, img_w = self.image_size
        out = []
        ms = self.min_sizes[k]
        ms_list = ms if isinstance(ms, list) else [ms]
        for m in ms_list:
            s_h = m / img_h
            s_w = m / img_w
            out.append((cx, cy, s_w, s_h))
            if len(self.max_sizes) != 0:
                mx = self.max_sizes[k]
                assert not isinstance(mx, list), "one max size per layer"
                s_h_p = math.sqrt(s_h * (mx / img_h))
                s_w_p = math.sqrt(s_w * (mx / img_w))
                out.append((cx, cy, s_w_p, s_h_p))
            for ar in self.aspect_ratios[k]:
                r = math.sqrt(ar)
                out.append((cx, cy, s_w * r, s_h / r))
                if self.flip:
                    out.append((cx, cy, s_w / r, s_h * r))
        return out

    # ------------------------------------------------------------------
    def __call__(self, layer_dims):
        """Generate the full prior tensor.

        Args:
            layer_dims: [(H_k, W_k), ...] spatial dims of each prediction map
                (obtained from the model via jax.eval_shape; reference probes
                them with forward hooks, lib/models/__init__.py:37-54).
        Returns:
            np.float32 [P, 4] center-size priors.
        """
        img_h, img_w = self.image_size
        priors = []
        for k, (fh, fw) in enumerate(layer_dims):
            # cells-per-step in each direction (steps are in input pixels)
            steps_x = img_w / self.steps[k]
            steps_y = img_h / self.steps[k]
            cell = np.asarray(
                [self._cell_priors(0.0, 0.0, k)], dtype=np.float64
            )  # [1, A, 4]
            jj, ii = np.meshgrid(np.arange(fw), np.arange(fh))  # row-major (i, j)
            cx = ((jj.reshape(-1) + 0.5) / steps_x)[:, None]
            cy = ((ii.reshape(-1) + 0.5) / steps_y)[:, None]
            grid = np.zeros((fh * fw, 1, 4))
            grid[:, 0, 0] = cx[:, 0]
            grid[:, 0, 1] = cy[:, 0]
            layer = cell + grid  # [HW, A, 4]
            priors.append(layer.reshape(-1, 4))
        out = np.concatenate(priors, axis=0).astype(np.float32)
        if self.clip_mode == "center_size":
            out = np.clip(out, 0.0, 1.0)  # reference quirk (prior_box.py:108)
        elif self.clip_mode == "point":
            pts = np.concatenate(
                [out[:, :2] - out[:, 2:] / 2, out[:, :2] + out[:, 2:] / 2], axis=1
            )
            pts = np.clip(pts, 0.0, 1.0)
            out = np.concatenate([(pts[:, :2] + pts[:, 2:]) / 2,
                                  pts[:, 2:] - pts[:, :2]], axis=1)
        return out


PRIOR_REGISTRY = {"PriorBoxSSD": PriorBoxSSD}


def prior_factory(cfg):
    name = cfg.MODEL.PRIOR_TYPE
    if name not in PRIOR_REGISTRY:
        raise KeyError("unknown prior type {!r}; known: {}".format(
            name, sorted(PRIOR_REGISTRY)))
    return PRIOR_REGISTRY[name](cfg)
