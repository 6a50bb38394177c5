"""Model zoo: explicit registries + factory.

Parity target: /root/reference/lib/models/__init__.py (model_factory:27).
Differences by design:
- dict registries instead of eval() on config strings (the reference's
  eval-based create(), lib/models/__init__.py:21-24, is an acknowledged
  hazard — SURVEY §7 "quirks not to copy").
- feature-map dims are probed with jax.eval_shape on the module (zero
  FLOPs, no hooks) instead of a dummy forward with forward hooks on the
  loc convs (reference get_layer_dims, lib/models/__init__.py:37-54).

The contract is identical: priors are generated from the *measured*
source dims, so anchors always match the real feature maps for any
backbone / input size.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.priors import prior_factory
from .common import L2Norm
from .drn import DRN, drn_d_22, drn_d_24
from .drnssd import DRNSSD
from .fpn import FPN
from .fssd import FSSD
from .refinedet import RefineDet
from .rfbnet import RFBNet
from .ssd import EXTRAS_SPEC, SSD, MultiBoxHead, parse_extras
from .vgg import VGG16

__all__ = ["SSD", "VGG16", "L2Norm", "MultiBoxHead", "EXTRAS_SPEC",
           "parse_extras", "model_factory", "create_model",
           "probe_layer_dims", "init_model", "BASE_REGISTRY", "SSD_REGISTRY",
           "FPN", "FSSD", "RFBNet", "RefineDet", "DRN", "DRNSSD",
           "drn_d_22", "drn_d_24"]


BASE_REGISTRY = {
    "vgg16": lambda cfg, dtype: VGG16(dtype=dtype,
                                      batch_norm=cfg.MODEL.BATCH_NORM),
    "drn_d_22": lambda cfg, dtype: drn_d_22(dtype=dtype),
    "drn_d_24": lambda cfg, dtype: drn_d_24(dtype=dtype),
}


def _extras_for(cfg):
    size = cfg.MODEL.IMAGE_SIZE[-1]
    return tuple(cfg.MODEL.EXTRAS) or tuple(EXTRAS_SPEC["ssd" + str(size)])


def _build_ssd(cfg, base, num_priors, dtype):
    return SSD(backbone=base, num_classes=cfg.MODEL.NUM_CLASSES,
               num_priors=tuple(num_priors), extras_spec=_extras_for(cfg),
               dtype=dtype)


def _build_fpn(cfg, base, num_priors, dtype):
    return FPN(backbone=base, num_classes=cfg.MODEL.NUM_CLASSES,
               num_priors=tuple(num_priors), extras_spec=_extras_for(cfg),
               dtype=dtype)


def _build_fssd(cfg, base, num_priors, dtype):
    return FSSD(backbone=base, num_classes=cfg.MODEL.NUM_CLASSES,
                num_priors=tuple(num_priors), dtype=dtype)


def _build_rfb(cfg, base, num_priors, dtype):
    return RFBNet(backbone=base, num_classes=cfg.MODEL.NUM_CLASSES,
                  num_priors=tuple(num_priors),
                  size=cfg.MODEL.IMAGE_SIZE[-1], dtype=dtype)


def _build_drnssd(cfg, base, num_priors, dtype):
    mid = DRN(layers=base.layers, channels=base.channels, out_middle=True,
              dtype=dtype)
    return DRNSSD(backbone=mid, num_classes=cfg.MODEL.NUM_CLASSES,
                  num_priors=tuple(num_priors), dtype=dtype)


def _build_refinedet(cfg, base, num_priors, dtype):
    if isinstance(base, VGG16):
        base = VGG16(dtype=base.dtype, batch_norm=base.batch_norm,
                     taps=("conv4_3", "conv5_3", "conv7"),
                     pool5_stride2=True)
    return RefineDet(backbone=base, num_classes=cfg.MODEL.NUM_CLASSES,
                     num_priors=tuple(num_priors), dtype=dtype)


SSD_REGISTRY = {
    "SSD": _build_ssd,
    # kept for config compatibility: the reference's SSD_COCO is the same
    # architecture wired without hooks (lib/models/ssd_coco.py:7)
    "SSD_COCO": _build_ssd,
    "FPN": _build_fpn,
    "FSSD": _build_fssd,
    "RFBNet": _build_rfb,
    "DRN_SSD": _build_drnssd,
    "RefineDet": _build_refinedet,
}


def register_base(name, builder):
    BASE_REGISTRY[name] = builder


def register_ssd(name, builder):
    SSD_REGISTRY[name] = builder


def create_model(cfg):
    """Build the (uninitialized) Flax module for cfg."""
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    if cfg.MODEL.BASE not in BASE_REGISTRY:
        raise KeyError("unknown base {!r}; known: {}".format(
            cfg.MODEL.BASE, sorted(BASE_REGISTRY)))
    if cfg.MODEL.SSD_TYPE not in SSD_REGISTRY:
        raise KeyError("unknown detector {!r}; known: {}".format(
            cfg.MODEL.SSD_TYPE, sorted(SSD_REGISTRY)))
    base = BASE_REGISTRY[cfg.MODEL.BASE](cfg, dtype)
    prior = prior_factory(cfg)
    num_priors = prior.num_priors
    cfg.MODEL.NUM_PRIOR = num_priors
    model = SSD_REGISTRY[cfg.MODEL.SSD_TYPE](cfg, base, num_priors, dtype)
    return model, prior


def probe_layer_dims(model, image_size) -> Sequence[tuple]:
    """Source feature-map spatial dims via jax.eval_shape (no compute)."""
    h, w = image_size

    def f(x):
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, x, train=False)
        out = model.apply(variables, x, train=False, return_sources=True,
                          mutable=False)
        return out[-1]  # sources are always the last element

    shapes = jax.eval_shape(f, jax.ShapeDtypeStruct((1, h, w, 3),
                                                    jnp.float32))
    return [(int(s.shape[1]), int(s.shape[2])) for s in shapes]


def model_factory(phase, cfg):
    """Build model + priors, mirroring the reference factory contract
    (model, priors, layer_dims) (lib/models/__init__.py:27-34).
    `phase` is accepted for parity; Flax modules take phase at apply time.
    """
    del phase
    model, prior = create_model(cfg)
    layer_dims = probe_layer_dims(model, cfg.MODEL.IMAGE_SIZE)
    if len(layer_dims) != len(prior.num_priors):
        raise ValueError(
            "model produced {} source maps but prior spec has {} entries"
            .format(len(layer_dims), len(prior.num_priors)))
    priors = jnp.asarray(prior(layer_dims))
    return model, priors, layer_dims


def init_model(model, cfg, rng=None, batch_size: int = 1):
    """Initialize variables with a dummy batch."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    h, w = cfg.MODEL.IMAGE_SIZE
    dummy = jnp.zeros((batch_size, h, w, 3), jnp.float32)
    return model.init(rng, dummy, train=False)
