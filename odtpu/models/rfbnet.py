"""RFBNet: Receptive Field Block SSD (arXiv:1711.07767).

Parity target: /root/reference/lib/models/rfb_net.py. We build the
*canonical VGG wiring* (the commented-out intended path at
rfb_net.py:188-196): conv4_3 relu -> BasicRFB_a(512,512) as source 0;
conv7 -> RFB extras. The reference's committed forward instead expects a
DRN base with out_middle=True that its factory never constructs
(rfb_net.py:199 vs drn_v3.py:287 — stale-as-committed, SURVEY §2.2);
the canonical wiring is what its README quotes numbers for.

RFBNet300 extras (extras_config '300' = [512,'S',512,'S',256],
add_extras rfb_net.py:276-302):
  RFB(1024->512, s1, visual2) -> 19x19    [source]
  RFB(512->512, s2, visual2)  -> 10x10    [source]
  RFB(512->256, s2, visual2)  -> 5x5      [source]
  Conv(256->128,k1)+Conv(128->256,k3 valid)        -> 3x3  [source]
  Conv(256->128,k1)+Conv(128->256,k3 valid,no bn)  -> 1x1  [source]
mbox = [6, 6, 6, 6, 4, 4].

BasicConv: conv(bias=False) + BN(momentum .01 torch = .99 flax) + ReLU.
RFB blocks: parallel dilated branches, 1x1 linear projection, scaled
residual shortcut: relu(out*scale + shortcut(x)).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import common
from .ssd import MultiBoxHead

Array = jax.Array


class BasicConv(nn.Module):
    """conv + optional BN + optional ReLU (rfb_net.py:11-26)."""
    features: int
    kernel: Any = 3
    stride: int = 1
    padding: Any = 0
    dilation: int = 1
    relu: bool = True
    bn: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) \
            else tuple(self.kernel)
        p = self.padding
        pad = ((p, p), (p, p)) if isinstance(p, int) else \
            ((p[0], p[0]), (p[1], p[1]))
        x = common.conv2d(x, self.features, k,
                          (self.stride, self.stride), pad,
                          (self.dilation, self.dilation),
                          use_bias=not self.bn, dtype=self.dtype,
                          name="conv")
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn")(x.astype(jnp.float32))
            x = x.astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicRFB(nn.Module):
    """3-branch receptive-field block (rfb_net.py:29-67)."""
    features: int
    stride: int = 1
    scale: float = 0.1
    visual: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        inter = in_ch // 8
        d = self.dtype
        v = self.visual

        b0 = BasicConv(2 * inter, kernel=1, stride=self.stride, dtype=d,
                       name="b0_0")(x, train)
        b0 = BasicConv(2 * inter, kernel=3, padding=v, dilation=v,
                       relu=False, dtype=d, name="b0_1")(b0, train)

        b1 = BasicConv(inter, kernel=1, dtype=d, name="b1_0")(x, train)
        b1 = BasicConv(2 * inter, kernel=3, stride=self.stride, padding=1,
                       dtype=d, name="b1_1")(b1, train)
        b1 = BasicConv(2 * inter, kernel=3, padding=v + 1, dilation=v + 1,
                       relu=False, dtype=d, name="b1_2")(b1, train)

        b2 = BasicConv(inter, kernel=1, dtype=d, name="b2_0")(x, train)
        b2 = BasicConv((inter // 2) * 3, kernel=3, padding=1, dtype=d,
                       name="b2_1")(b2, train)
        b2 = BasicConv(2 * inter, kernel=3, stride=self.stride, padding=1,
                       dtype=d, name="b2_2")(b2, train)
        b2 = BasicConv(2 * inter, kernel=3, padding=2 * v + 1,
                       dilation=2 * v + 1, relu=False, dtype=d,
                       name="b2_3")(b2, train)

        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = BasicConv(self.features, kernel=1, relu=False, dtype=d,
                        name="linear")(out, train)
        short = BasicConv(self.features, kernel=1, stride=self.stride,
                          relu=False, dtype=d, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


class BasicRFBa(nn.Module):
    """4-branch RFB-a with asymmetric 1x3/3x1 convs (rfb_net.py:71-117);
    normalizes the conv4_3-level feature."""
    features: int
    stride: int = 1
    scale: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        inter = in_ch // 4
        d = self.dtype

        b0 = BasicConv(inter, kernel=1, dtype=d, name="b0_0")(x, train)
        b0 = BasicConv(inter, kernel=3, padding=1, relu=False, dtype=d,
                       name="b0_1")(b0, train)

        b1 = BasicConv(inter, kernel=1, dtype=d, name="b1_0")(x, train)
        b1 = BasicConv(inter, kernel=(3, 1), padding=(1, 0), dtype=d,
                       name="b1_1")(b1, train)
        b1 = BasicConv(inter, kernel=3, padding=3, dilation=3, relu=False,
                       dtype=d, name="b1_2")(b1, train)

        b2 = BasicConv(inter, kernel=1, dtype=d, name="b2_0")(x, train)
        b2 = BasicConv(inter, kernel=(1, 3), stride=self.stride,
                       padding=(0, 1), dtype=d, name="b2_1")(b2, train)
        b2 = BasicConv(inter, kernel=3, padding=3, dilation=3, relu=False,
                       dtype=d, name="b2_2")(b2, train)

        b3 = BasicConv(inter // 2, kernel=1, dtype=d, name="b3_0")(x, train)
        b3 = BasicConv((inter // 4) * 3, kernel=(1, 3), padding=(0, 1),
                       dtype=d, name="b3_1")(b3, train)
        b3 = BasicConv(inter, kernel=(3, 1), stride=self.stride,
                       padding=(1, 0), dtype=d, name="b3_2")(b3, train)
        b3 = BasicConv(inter, kernel=3, padding=5, dilation=5, relu=False,
                       dtype=d, name="b3_3")(b3, train)

        out = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        out = BasicConv(self.features, kernel=1, relu=False, dtype=d,
                        name="linear")(out, train)
        short = BasicConv(self.features, kernel=1, stride=self.stride,
                          relu=False, dtype=d, name="shortcut")(x, train)
        return nn.relu(out * self.scale + short)


class RFBNet(nn.Module):
    """RFBNet300/512 over a VGG16 backbone."""
    backbone: nn.Module
    num_classes: int
    num_priors: Sequence[int]
    size: int = 300
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        d = self.dtype
        (conv4_3, conv7), feat = self.backbone(x, train=train)
        sources = [BasicRFBa(conv4_3.shape[-1], scale=1.0, dtype=d,
                             name="norm_rfb_a")(conv4_3, train)]

        if self.size == 300:
            feat = BasicRFB(512, stride=1, scale=1.0, visual=2, dtype=d,
                            name="rfb_0")(feat, train)
            sources.append(feat)
            feat = BasicRFB(512, stride=2, scale=1.0, visual=2, dtype=d,
                            name="rfb_1")(feat, train)
            sources.append(feat)
            feat = BasicRFB(256, stride=2, scale=1.0, visual=2, dtype=d,
                            name="rfb_2")(feat, train)
            sources.append(feat)
            feat = BasicConv(128, kernel=1, dtype=d,
                             name="conv_3a")(feat, train)
            feat = BasicConv(256, kernel=3, dtype=d,
                             name="conv_3b")(feat, train)
            sources.append(feat)
            feat = BasicConv(128, kernel=1, dtype=d,
                             name="conv_4a")(feat, train)
            feat = BasicConv(256, kernel=3, bn=False, dtype=d,
                             name="conv_4b")(feat, train)
            sources.append(feat)
        elif self.size == 512:
            feat = BasicRFB(1024, stride=1, scale=1.0, visual=2, dtype=d,
                            name="rfb_0")(feat, train)
            sources.append(feat)
            specs = [(512, 2), (256, 2), (256, 2), (256, 2)]
            for i, (f, s) in enumerate(specs):
                vis = 1 if feat.shape[-1] == 256 else 2
                feat = BasicRFB(f, stride=s, scale=1.0, visual=vis, dtype=d,
                                name=f"rfb_{i+1}")(feat, train)
                sources.append(feat)
            feat = BasicConv(128, kernel=1, dtype=d,
                             name="conv_5a")(feat, train)
            feat = BasicConv(256, kernel=4, padding=1, dtype=d,
                             name="conv_5b")(feat, train)
            sources.append(feat)
        else:
            raise ValueError("RFBNet supports size 300 or 512")

        loc, conf = MultiBoxHead(self.num_classes, self.num_priors,
                                 dtype=d, name="head")(sources)
        if phase == "eval":
            conf = jax.nn.softmax(conf, axis=-1)
        if return_sources:
            return loc, conf, sources
        return loc, conf
