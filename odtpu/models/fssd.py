"""FSSD: Feature-Fusion SSD.

Parity target: /root/reference/lib/models/fssd.py (FSSD:8; paper
arXiv:1712.00960). Structure for 300 input (extras table, fssd.py:203):

- fusion sources: conv4_3 conv output (pre-ReLU, fssd.py:46 captures the
  module output at index 21), conv7 conv output (index 33), and one
  extra stage (1x1 1024->256 then 3x3/s2 256->512, both WITHOUT ReLU —
  the reference appends bare convs, fssd.py:163-166) -> 10x10/512;
- each source: 1x1 conv+ReLU to 256, bilinear-upsampled to the 38x38
  map, concatenated (768ch) and BatchNorm'd (fssd.py:35,61-62);
- pyramid convs (conv+ReLU) [512@38(s1,p1), 512@19(s2), 256@10(s2),
  256@5(s2), 256@3(valid), 256@1(valid)] feed the heads.

Note: the reference FSSD is wired for its legacy dict config and cannot
be built through the modern factory (SURVEY §2.2 incompatibility); here
it is a first-class factory citizen.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv
from .fpn import upsample_bilinear
from .ssd import MultiBoxHead

# (features, stride, padding) per pyramid conv, 300-input spec
FSSD300_PYRAMID = [(512, 1, 1), (512, 2, 1), (256, 2, 1), (256, 2, 1),
                   (256, 1, 0), (256, 1, 0)]
FSSD_FUSION_DIM = 256


class FSSD(nn.Module):
    """Feature-fusion SSD.

    Deviation note: the reference accidentally captures PRE-ReLU
    conv4_3/conv7 outputs ("is get output of relu error", fssd.py:46);
    this module uses the standard post-ReLU sources — FSSD's 1x1
    transform convs immediately re-project, so the difference is
    negligible when training from scratch.
    """
    backbone: nn.Module
    num_classes: int
    num_priors: Sequence[int]
    pyramid_spec: Sequence = tuple(FSSD300_PYRAMID)
    fusion_dim: int = FSSD_FUSION_DIM
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        (conv4_3, conv7), feat = self.backbone(x, train=train)
        # fusion extra stage: 1x1 then 3x3/s2, no ReLU (reference parity)
        e = Conv(self.fusion_dim, kernel=1, padding=0, relu=False,
                 dtype=self.dtype, name="fuse_extra_0")(feat, train)
        e = Conv(self.fusion_dim * 2, kernel=3, stride=2, padding=1,
                 relu=False, dtype=self.dtype, name="fuse_extra_1")(e, train)
        fusion_sources = [conv4_3, conv7, e]

        up = (conv4_3.shape[1], conv4_3.shape[2])
        transformed = []
        for i, s in enumerate(fusion_sources):
            t = Conv(self.fusion_dim, kernel=1, padding=0, dtype=self.dtype,
                     name=f"transform_{i}")(s, train)
            if i > 0:
                t = upsample_bilinear(t, up)
            transformed.append(t)
        fused = jnp.concatenate(transformed, axis=-1)
        fused = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="fusion_bn")(fused.astype(jnp.float32))
        fused = fused.astype(self.dtype)

        pyramids = []
        feat = fused
        for i, (f, s, p) in enumerate(self.pyramid_spec):
            feat = Conv(f, kernel=3, stride=s, padding=p, dtype=self.dtype,
                        name=f"pyramid_{i}")(feat, train)
            pyramids.append(feat)

        loc, conf = MultiBoxHead(self.num_classes, self.num_priors,
                                 dtype=self.dtype, name="head")(pyramids)
        if phase == "eval":
            conf = jax.nn.softmax(conf, axis=-1)
        if return_sources:
            return loc, conf, pyramids
        return loc, conf
