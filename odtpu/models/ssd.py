"""SSD detector head over any multi-scale backbone.

Parity target: /root/reference/lib/models/ssd_v3.py (SSD:13). The
reference captures source features with forward hooks keyed by module
-name tables and probes feature dims with a dummy forward; here the
backbone *returns* its sources explicitly and dims come from
jax.eval_shape (odtpu/models/__init__.py) — no hooks, no thread-local
shims (the reference needed ThreadLocalData for DataParallel races,
ssd_v3.py:8-11; SPMD sharding has no such hazard).

Extras are declared in the reference's compact spec format
(extras_config, ssd_v3.py:245-249) and parsed with identical semantics:
alternating 1x1 / 3x3 convs, 'S' = stride-2 pad-1 on the following
feature count, a source captured after every second conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv, L2Norm, xavier_uniform

Array = jax.Array

# reference extras specs (ssd_v3.py:245-249), keyed by input size
EXTRAS_SPEC = {
    "ssd300": [256, "S", 512, 128, "S", 256, 128, 256, 128, 256],
    "ssd512": [256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256,
               128, "S", 256],
}


def parse_extras(spec: Sequence):
    """Reference-style spec -> [(features, kernel, stride, padding), ...].
    Mirrors add_extras (ssd_v3.py:157-179): kernel alternates 1,3; 'S'
    entries emit a stride-2 pad-1 3x3 conv producing the *next* count."""
    layers = []
    flag = False  # False -> kernel 1, True -> kernel 3
    in_ch_is_s = False
    for k, v in enumerate(spec):
        if not in_ch_is_s:
            if v == "S":
                layers.append((spec[k + 1], 3 if flag else 1, 2, 1))
            else:
                layers.append((v, 3 if flag else 1, 1, 0))
            flag = not flag
        in_ch_is_s = v == "S"
    return layers


class MultiBoxHead(nn.Module):
    """Per-source 3x3 loc/conf convs -> flattened [B, P, 4] / [B, P, C].

    NHWC conv output [B,H,W,A*4] reshapes directly to the reference's
    permute(0,2,3,1)+flatten ordering (ssd_v3.py:114-121), which is also
    the prior-generation order (cell-major, anchor-minor).
    """
    num_classes: int
    num_priors: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, sources: Sequence[Array]):
        locs, confs = [], []
        for i, (src, a) in enumerate(zip(sources, self.num_priors)):
            b = src.shape[0]
            # heads stay full-precision under quantized("int8"): they are
            # a few % of model FLOPs but set loc/conf output precision
            # directly (box IoU vs f32 degrades measurably if quantized)
            l = Conv(a * 4, kernel=3, padding=1, relu=False, dtype=self.dtype,
                     kernel_init=xavier_uniform(), quantizable=False,
                     name=f"loc_{i}")(src)
            c = Conv(a * self.num_classes, kernel=3, padding=1, relu=False,
                     dtype=self.dtype, kernel_init=xavier_uniform(),
                     quantizable=False, name=f"conf_{i}")(src)
            locs.append(l.reshape(b, -1, 4))
            confs.append(c.reshape(b, -1, self.num_classes))
        loc = jnp.concatenate(locs, axis=1).astype(jnp.float32)
        conf = jnp.concatenate(confs, axis=1).astype(jnp.float32)
        return loc, conf


class SSD(nn.Module):
    """Single Shot Multibox Detector.

    __call__(x, phase) -> (loc [B,P,4], conf [B,P,C]); conf is softmaxed
    when phase == 'eval' (matching ssd_v3.py:123-127). With
    return_sources=True also returns the source feature list (used by the
    factory's eval_shape dims probe).
    """
    backbone: nn.Module
    num_classes: int
    num_priors: Sequence[int]
    extras_spec: Sequence
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, phase: str = "train", train: bool = False,
                 return_sources: bool = False):
        sources, feat = self.backbone(x, train=train)
        sources = list(sources)
        sources[0] = L2Norm(dtype=self.dtype, name="l2norm")(sources[0])

        for i, (f, k, s, p) in enumerate(parse_extras(self.extras_spec)):
            feat = Conv(f, kernel=k, stride=s, padding=p, dtype=self.dtype,
                        name=f"extras_{i}")(feat, train)
            if i % 2 == 1:  # capture after every second extra conv
                sources.append(feat)

        loc, conf = MultiBoxHead(self.num_classes, self.num_priors,
                                 dtype=self.dtype, name="head")(sources)
        if phase == "eval":
            conf = jax.nn.softmax(conf, axis=-1)
        if return_sources:
            return loc, conf, sources
        return loc, conf
