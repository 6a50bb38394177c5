"""FPN-SSD: SSD with a top-down feature pyramid.

Parity target: /root/reference/lib/models/fpn_v2.py (FPN:14, README
credits it with VOC 78.3). Structure for vgg16 (extras_config,
fpn_v2.py:222-226): the standard SSD300 extras produce 6 sources
(conv4_3, conv7, 10x10/512, 5x5/256, 3x3/256, 1x1/256); each source
gets a 1x1 lateral conv to 256ch ("transforms"); the pyramid is built
coarse-to-fine and each level gets a 3x3/256 smoothing conv before the
heads.

Quirk kept: the reference's top-down step adds the *adjacent lateral*
(upsampled), not the accumulated pyramid (fpn_v2.py:86: upsample_add
uses transformed[-idx], which is a lateral). `accumulate=True` switches
to the standard FPN accumulation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv, L2Norm
from .ssd import MultiBoxHead, parse_extras


def _align_corners_weights(n_in: int, n_out: int):
    """[n_out, n_in] interpolation matrix for 1-D linear resize with
    align_corners=True: output i samples input coordinate
    i*(n_in-1)/(n_out-1). Built at trace time (static shapes)."""
    import numpy as np
    if n_in == 1 or n_out == 1:
        w = np.zeros((n_out, n_in), np.float32)
        w[:, 0] = 1.0
        return jnp.asarray(w)
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, n_in - 2)
    frac = (coords - lo).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    w[np.arange(n_out), lo] = 1.0 - frac
    w[np.arange(n_out), lo + 1] += frac
    return jnp.asarray(w)


def upsample_bilinear(x, size):
    """NHWC bilinear resize with torch align_corners=True semantics.

    Parity: the reference's F.upsample(mode='bilinear') under torch 0.3.1
    defaults to align_corners=True (fpn_v2.py:155, fssd.py:118). That
    sampling grid differs from jax.image.resize's half-pixel centers, so
    the map is applied explicitly as two separable matmuls (MXU-friendly,
    f32 accumulate). Golden-tested against
    torch.nn.functional.interpolate(..., align_corners=True)."""
    b, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x
    wh = _align_corners_weights(h, oh)
    ww = _align_corners_weights(w, ow)
    out = jnp.einsum("oh,bhwc->bowc", wh, x,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,bhwc->bhpc", ww, out,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


class FPN(nn.Module):
    backbone: nn.Module
    num_classes: int
    num_priors: Sequence[int]
    extras_spec: Sequence
    fpn_dim: int = 256
    accumulate: bool = False  # reference behavior: pairwise lateral adds
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        sources, feat = self.backbone(x, train=train)
        sources = list(sources)
        sources[0] = L2Norm(dtype=self.dtype, name="l2norm")(sources[0])
        for i, (f, k, s, p) in enumerate(parse_extras(self.extras_spec)):
            feat = Conv(f, kernel=k, stride=s, padding=p, dtype=self.dtype,
                        name=f"extras_{i}")(feat, train)
            if i % 2 == 1:
                sources.append(feat)

        # lateral 1x1 transforms to fpn_dim
        laterals = [
            Conv(self.fpn_dim, kernel=1, padding=0, relu=False,
                 dtype=self.dtype, name=f"transform_{i}")(s)
            for i, s in enumerate(sources)
        ]

        # top-down: coarsest first (idx 0 = last lateral)
        n = len(laterals)
        pyramids = []
        for idx in range(n):
            lat = laterals[n - 1 - idx]
            if idx == 0:
                merged = lat
            else:
                above = (pyramids[-1] if self.accumulate
                         else laterals[n - idx])
                merged = lat + upsample_bilinear(
                    above, (lat.shape[1], lat.shape[2]))
            merged = Conv(self.fpn_dim, kernel=3, padding=1, relu=False,
                          dtype=self.dtype,
                          name=f"pyramid_{idx}")(merged, train)
            pyramids.append(merged)
        pyramids = pyramids[::-1]  # back to fine -> coarse

        loc, conf = MultiBoxHead(self.num_classes, self.num_priors,
                                 dtype=self.dtype, name="head")(pyramids)
        if phase == "eval":
            conf = jax.nn.softmax(conf, axis=-1)
        if return_sources:
            return loc, conf, pyramids
        return loc, conf
