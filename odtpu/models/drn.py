"""DRN-D: Dilated Residual Network backbones (arch-D).

Parity target: /root/reference/lib/models/drn_v3.py (DRN:98,
drn_d_22:285). Layer plan (arch D, BasicBlock):
  layer0:  7x7 conv stem, stride 1
  layer1/2: plain conv layers (stride 1 / 2)
  layer3/4: residual stages, stride 2
  layer5/6: residual stages, dilation 2 / 4 (no stride)
  layer7..9: plain conv layers (layer7 stride 2, dilation 2; 8/9 dil 1)
  layer10/11: plain conv layers mimicking vgg conv6/7 (drn_v3.py:162)

SSD source taps (ssd_v3.py predict sources for drn_d_22): layer6 output
(stride 8) and layer11 output (stride 16), then the standard extras.
The registry's dangling 'drn_d_24' (imports drn_v3 which lacks it —
SURVEY §2.2) is *fixed* here: drn_d_24 follows drn_v5.py:309's v30
layer plan.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv


class BasicBlock(nn.Module):
    """Two 3x3 convs + BN with residual (drn_v3.py:18-52)."""
    features: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    residual: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out = Conv(self.features, kernel=3, stride=self.stride,
                   padding=self.dilation[0], dilation=self.dilation[0],
                   batch_norm=True, use_bias=False, dtype=d,
                   name="conv1")(x, train)
        out = Conv(self.features, kernel=3, padding=self.dilation[1],
                   dilation=self.dilation[1], batch_norm=True, relu=False,
                   use_bias=False, dtype=d, name="conv2")(out, train)
        if self.residual:
            if self.stride != 1 or x.shape[-1] != self.features:
                x = Conv(self.features, kernel=1, stride=self.stride,
                         padding=0, batch_norm=True, relu=False,
                         use_bias=False, dtype=d, name="down")(x, train)
            out = out + x
        return nn.relu(out)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block (drn_v3.py:55-95)."""
    features: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out = Conv(self.features, kernel=1, padding=0, batch_norm=True,
                   use_bias=False, dtype=d, name="conv1")(x, train)
        out = Conv(self.features, kernel=3, stride=self.stride,
                   padding=self.dilation[1], dilation=self.dilation[1],
                   batch_norm=True, use_bias=False, dtype=d,
                   name="conv2")(out, train)
        out = Conv(self.features * 4, kernel=1, padding=0, batch_norm=True,
                   relu=False, use_bias=False, dtype=d,
                   name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            x = Conv(self.features * 4, kernel=1, stride=self.stride,
                     padding=0, batch_norm=True, relu=False, use_bias=False,
                     dtype=d, name="down")(x, train)
        return nn.relu(out + x)


class _ConvStage(nn.Module):
    """Plain conv(+BN+ReLU) stack (_make_conv_layers, drn_v3.py:206)."""
    features: int
    convs: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.convs):
            x = Conv(self.features, kernel=3,
                     stride=self.stride if i == 0 else 1,
                     padding=self.dilation, dilation=self.dilation,
                     batch_norm=True, use_bias=False, dtype=self.dtype,
                     name=f"conv_{i}")(x, train)
        return x


class _ResStage(nn.Module):
    """Residual stage (_make_layer, drn_v3.py:182-204)."""
    features: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    new_level: bool = True
    residual: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dilation == 1:
            first_dil = (1, 1)
        else:
            first = self.dilation // 2 if self.new_level else self.dilation
            first_dil = (first, self.dilation)
        x = BasicBlock(self.features, stride=self.stride, dilation=first_dil,
                       residual=self.residual, dtype=self.dtype,
                       name="block_0")(x, train)
        for i in range(1, self.blocks):
            x = BasicBlock(self.features,
                           dilation=(self.dilation, self.dilation),
                           residual=self.residual, dtype=self.dtype,
                           name=f"block_{i}")(x, train)
        return x


class DRN(nn.Module):
    """Arch-D DRN returning ([layer6_out, layer11_out], layer11_out) —
    the SSD source contract for drn bases; set out_middle=True to get
    every stage output instead (DRN_SSD needs them)."""
    layers: Sequence[int]  # 11 entries (layer1..layer11)
    channels: Sequence[int]
    out_middle: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        ch = list(self.channels)
        ly = list(self.layers)
        y = []
        x = Conv(ch[0], kernel=7, padding=3, batch_norm=True,
                 use_bias=False, dtype=d, name="layer0")(x, train)
        x = _ConvStage(ch[0], ly[0], stride=1, dtype=d,
                       name="layer1")(x, train)
        y.append(x)
        x = _ConvStage(ch[1], ly[1], stride=2, dtype=d,
                       name="layer2")(x, train)
        y.append(x)
        x = _ResStage(ch[2], ly[2], stride=2, dtype=d,
                      name="layer3")(x, train)
        y.append(x)
        x = _ResStage(ch[3], ly[3], stride=2, dtype=d,
                      name="layer4")(x, train)
        y.append(x)
        x = _ResStage(ch[4], ly[4], dilation=2, new_level=False, dtype=d,
                      name="layer5")(x, train)
        y.append(x)
        mid = None
        if ly[5]:
            x = _ResStage(ch[5], ly[5], dilation=4, new_level=False,
                          dtype=d, name="layer6")(x, train)
            y.append(x)
            mid = x
        if ly[6]:
            x = _ConvStage(ch[6], ly[6], stride=2, dilation=2, dtype=d,
                           name="layer7")(x, train)
            y.append(x)
        if ly[7]:
            x = _ConvStage(ch[7], ly[7], dilation=1, dtype=d,
                           name="layer8")(x, train)
            y.append(x)
        if len(ly) > 8 and ly[8]:
            x = _ConvStage(ch[8], ly[8], dilation=1, dtype=d,
                           name="layer9")(x, train)
            y.append(x)
        if len(ly) > 9 and ly[9]:
            x = _ConvStage(ch[9], ly[9], dilation=1, dtype=d,
                           name="layer10")(x, train)
            y.append(x)
        if len(ly) > 10 and ly[10]:
            x = _ConvStage(ch[10], ly[10], dilation=1, dtype=d,
                           name="layer11")(x, train)
            y.append(x)
        if self.out_middle:
            return y, x
        return [mid if mid is not None else y[4], x], x


def drn_d_22(dtype=jnp.bfloat16, out_middle=False):
    """drn_v3.py:285 layer plan."""
    return DRN(layers=(1, 1, 2, 2, 2, 2, 1, 1, 1, 1, 1),
               channels=(16, 32, 64, 128, 256, 512, 512, 512, 512, 512, 512),
               out_middle=out_middle, dtype=dtype)


def drn_d_24(dtype=jnp.bfloat16, out_middle=False):
    """drn_v5.py:309 ('v30') layer plan — the registry entry the
    reference declares but cannot build."""
    return DRN(layers=(1, 1, 2, 2, 2, 2, 2, 2, 1, 1, 1),
               channels=(16, 32, 64, 128, 256, 512, 512, 512, 512, 512, 512),
               out_middle=out_middle, dtype=dtype)
