"""RefineDet: two-step anchor refinement (ARM + ODM + TCB).

The reference README claims RefineDet support but ships no code
(README.md:6; SURVEY TL;DR), and BASELINE.json requires RefineDet320
ARM+ODM training — so this module is designed fresh from the paper
(Zhang et al., CVPR'18, arXiv:1711.06897) on top of this framework's
head/loss abstractions:

- ARM (anchor refinement module): binary objectness + loc heads on the
  raw backbone sources; its loc output refines the anchor grid.
- TCB (transfer connection blocks): per level conv256-relu-conv256,
  + upsampled deeper TCB (top-down), relu, conv256-relu.
- ODM (object detection module): C-class + loc heads on TCB outputs,
  regressing against the ARM-refined anchors.

RefineDet320-VGG16 sources: conv4_3 (L2Norm scale 10), conv5_3 (L2Norm
scale 8), conv7, and one extra 1x1(256)+3x3/s2(512) stage; 3 anchors
per cell (1 square + AR-2 pair; MAX_SIZES empty).

Companion pieces: odtpu.layers.refine_loss (two-stage multibox loss with
negative-anchor filtering) and odtpu.ops.detect.detect_refine (two-step
decode).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv, L2Norm, xavier_uniform
from .fpn import upsample_bilinear


class TCB(nn.Module):
    """Transfer connection block for one pyramid level."""
    dim: int = 256
    has_deeper: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deeper=None, train: bool = False):
        d = self.dtype
        x = Conv(self.dim, kernel=3, padding=1, dtype=d,
                 name="conv1")(x, train)
        x = Conv(self.dim, kernel=3, padding=1, relu=False, dtype=d,
                 name="conv2")(x, train)
        if deeper is not None:
            up = upsample_bilinear(deeper, (x.shape[1], x.shape[2]))
            up = Conv(self.dim, kernel=3, padding=1, relu=False, dtype=d,
                      name="up_conv")(up, train)
            x = x + up
        x = nn.relu(x)
        x = Conv(self.dim, kernel=3, padding=1, dtype=d,
                 name="conv3")(x, train)
        return x


class RefineDet(nn.Module):
    """Returns (arm_loc [B,P,4], arm_conf [B,P,2], odm_loc [B,P,4],
    odm_conf [B,P,C]); eval phase softmaxes both confs."""
    backbone: nn.Module  # must tap (conv4_3, conv5_3, conv7)
    num_classes: int
    num_priors: Sequence[int]
    tcb_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        d = self.dtype
        (c43, c53, c7), feat = self.backbone(x, train=train)
        e = Conv(256, kernel=1, padding=0, dtype=d,
                 name="extra_0")(feat, train)
        e = Conv(512, kernel=3, stride=2, padding=1, dtype=d,
                 name="extra_1")(e, train)
        sources = [
            L2Norm(scale_init=10.0, dtype=d, name="l2norm_4_3")(c43),
            L2Norm(scale_init=8.0, dtype=d, name="l2norm_5_3")(c53),
            c7, e,
        ]

        # ---- ARM heads on raw sources ----
        arm_loc, arm_conf = [], []
        for i, (s, a) in enumerate(zip(sources, self.num_priors)):
            b = s.shape[0]
            # arm_loc zero-init: refined anchors feed the ODM's
            # matching from step 1 (losses.refinedet_loss), and at init
            # the ARM ignores nothing (P(bg)~0.5) so matching runs over
            # ALL refined boxes — zero offsets make refined == priors
            # exactly until the ARM learns, instead of xavier-scale
            # random boxes (per-positive smooth-L1 ~14 measured at
            # init). Toy-neutral, strictly cleaner early ODM targets.
            l = Conv(a * 4, kernel=3, padding=1, relu=False, dtype=d,
                     kernel_init=nn.initializers.zeros,
                     quantizable=False, name=f"arm_loc_{i}")(s)
            c = Conv(a * 2, kernel=3, padding=1, relu=False, dtype=d,
                     kernel_init=xavier_uniform(),
                     quantizable=False, name=f"arm_conf_{i}")(s)
            arm_loc.append(l.reshape(b, -1, 4))
            arm_conf.append(c.reshape(b, -1, 2))
        arm_loc = jnp.concatenate(arm_loc, 1).astype(jnp.float32)
        arm_conf = jnp.concatenate(arm_conf, 1).astype(jnp.float32)

        # ---- TCB top-down ----
        tcb_outs = [None] * len(sources)
        deeper = None
        for i in reversed(range(len(sources))):
            deeper = TCB(self.tcb_dim, has_deeper=deeper is not None,
                         dtype=d, name=f"tcb_{i}")(
                             sources[i], deeper, train)
            tcb_outs[i] = deeper

        # ---- ODM heads on TCB outputs ----
        # L2Norm (learnable scale, init 20) on every TCB output before
        # the heads. From-scratch necessity, not in the paper (whose
        # pretrained backbone sidesteps it): raw TCB activations sit at
        # std 0.33-0.66, so dW for the conf head (∝ feature magnitude)
        # is starved — measured on frozen iter-2k TCB features, a fresh
        # linear head under the run's exact mined-CE/SGD/lr reaches only
        # 0.22 positive-class accuracy in 600 steps, while the SAME
        # setup on L2Norm(20) features reaches 0.86 (BENCH_NOTES
        # round-4). SSD300 never hits this because its dominant source
        # (conv4_3, 5776/8732 anchors) is L2Norm-rescaled the same way.
        odm_loc, odm_conf = [], []
        for i, (s, a) in enumerate(zip(tcb_outs, self.num_priors)):
            s = L2Norm(scale_init=20.0, dtype=d, name=f"odm_norm_{i}")(s)
            b = s.shape[0]
            l = Conv(a * 4, kernel=3, padding=1, relu=False, dtype=d,
                     kernel_init=xavier_uniform(),
                     quantizable=False, name=f"odm_loc_{i}")(s)
            c = Conv(a * self.num_classes, kernel=3, padding=1, relu=False,
                     dtype=d, kernel_init=xavier_uniform(),
                     quantizable=False, name=f"odm_conf_{i}")(s)
            odm_loc.append(l.reshape(b, -1, 4))
            odm_conf.append(c.reshape(b, -1, self.num_classes))
        odm_loc = jnp.concatenate(odm_loc, 1).astype(jnp.float32)
        odm_conf = jnp.concatenate(odm_conf, 1).astype(jnp.float32)

        if phase == "eval":
            arm_conf = jax.nn.softmax(arm_conf, axis=-1)
            odm_conf = jax.nn.softmax(odm_conf, axis=-1)
        if return_sources:
            return arm_loc, arm_conf, odm_loc, odm_conf, sources
        return arm_loc, arm_conf, odm_loc, odm_conf


def refinedet320_cfg(cfg):
    """Overlay RefineDet320 anchor spec onto a config tree."""
    cfg.DATASET.IMAGE_SIZE = (320, 320)
    cfg.MODEL.IMAGE_SIZE = (320, 320)
    cfg.MODEL.SSD_TYPE = "RefineDet"
    cfg.MODEL.STEPS = [8, 16, 32, 64]
    cfg.MODEL.MIN_SIZES = [32, 64, 128, 256]
    cfg.MODEL.MAX_SIZES = []
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    return cfg
