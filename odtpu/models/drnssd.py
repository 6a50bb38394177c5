"""DRN_SSD: multibox heads directly on DRN middle stage outputs.

Parity target: /root/reference/lib/models/drnssd.py (DRN_SSD:10):
sources = [L2Norm(y[3])] + y[4:], heads on the first 6 (predict_source
= layers 4..9, drnssd.py:115); no extras. Requires an out_middle DRN
base (the reference factory never builds one — fixed here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import L2Norm
from .ssd import MultiBoxHead


class DRNSSD(nn.Module):
    backbone: nn.Module  # DRN with out_middle=True
    num_classes: int
    num_priors: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        y, _ = self.backbone(x, train=train)
        n = len(self.num_priors)
        sources = [L2Norm(dtype=self.dtype, name="l2norm")(y[3])]
        sources += list(y[4:4 + n - 1])
        loc, conf = MultiBoxHead(self.num_classes, self.num_priors,
                                 dtype=self.dtype, name="head")(sources)
        if phase == "eval":
            conf = jax.nn.softmax(conf, axis=-1)
        if return_sources:
            return loc, conf, sources
        return loc, conf
