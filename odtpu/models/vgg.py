"""VGG16 'reduced fc' backbone — the canonical SSD base network.

Parity target: /root/reference/lib/models/vgg.py (torchvision-style layer
list: ceil-mode pool3, pool5 3x3/s1/p1, dilated conv6 k3/p6/d6, conv7 1x1).
TPU-first differences: NHWC layout, explicit named sources returned from
__call__ (the reference captures them with forward hooks on layer indices
21/33, lib/models/ssd_v3.py:194-243), bf16 compute / f32 params.

Named convs (for weight import from the standard vgg16_reducedfc
checkpoint; torch nn.Sequential index in parens):
    conv1_1(0) conv1_2(2) | conv2_1(5) conv2_2(7)
    conv3_1(10) conv3_2(12) conv3_3(14) | conv4_1(17) conv4_2(19) conv4_3(21)
    conv5_1(24) conv5_2(26) conv5_3(28) | conv6(31) conv7(33)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv, max_pool_ceil

# torch Sequential index -> our conv name (for the weight converter)
TORCH_INDEX_TO_NAME = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    31: "conv6", 33: "conv7",
}


class VGG16(nn.Module):
    """Returns (sources, final): sources are the post-ReLU activations at
    `taps` (default [conv4_3, conv7], the two base-net SSD sources);
    final = conv7 relu (feeds extras). RefineDet taps conv5_3 too.
    """
    dtype: Any = jnp.bfloat16
    batch_norm: bool = False
    taps: tuple = ("conv4_3", "conv7")
    # RefineDet variant: standard 2x2/s2 pool5 + fc6 dilation 3 so conv7
    # sits at stride 32 (paper strides 8/16/32/64); default is the SSD
    # 'reduced fc' 3x3/s1 pool5 + dilation 6 (stride 16)
    pool5_stride2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bn = self.batch_norm
        acts = {}

        def c(name, feat, **kw):
            return Conv(feat, kernel=3, padding=1, dtype=d, batch_norm=bn,
                        name=name, **kw)

        x = c("conv1_1", 64)(x, train)
        x = c("conv1_2", 64)(x, train)
        x = max_pool_ceil(x, 2, 2)
        x = c("conv2_1", 128)(x, train)
        x = c("conv2_2", 128)(x, train)
        x = max_pool_ceil(x, 2, 2)
        x = c("conv3_1", 256)(x, train)
        x = c("conv3_2", 256)(x, train)
        x = c("conv3_3", 256)(x, train)
        x = max_pool_ceil(x, 2, 2, ceil_mode=True)  # 75 -> 38 for 300 input
        x = c("conv4_1", 512)(x, train)
        x = c("conv4_2", 512)(x, train)
        x = c("conv4_3", 512)(x, train)
        acts["conv4_3"] = x
        x = max_pool_ceil(x, 2, 2)
        x = c("conv5_1", 512)(x, train)
        x = c("conv5_2", 512)(x, train)
        x = c("conv5_3", 512)(x, train)
        acts["conv5_3"] = x
        if self.pool5_stride2:
            x = max_pool_ceil(x, 2, 2)
            x = Conv(1024, kernel=3, padding=3, dilation=3, dtype=d,
                     batch_norm=bn, name="conv6")(x, train)
        else:
            x = max_pool_ceil(x, 3, 1, padding=1)  # pool5: keeps dims
            x = Conv(1024, kernel=3, padding=6, dilation=6, dtype=d,
                     batch_norm=bn, name="conv6")(x, train)
        x = Conv(1024, kernel=1, padding=0, dtype=d, batch_norm=bn,
                 name="conv7")(x, train)
        acts["conv7"] = x
        return [acts[t] for t in self.taps], x
