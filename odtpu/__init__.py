"""odtpu — a TPU-native (JAX/XLA/Flax/Pallas) object-detection framework.

Rebuild of the capabilities of arleyzhang/object-detection-pytorch
(reference: /root/reference) with a TPU-first architecture:

- SSD-family single-shot detectors (SSD300/512, FSSD, FPN-SSD, RFBNet,
  DRN-SSD, RefineDet) as Flax modules in NHWC, compiled by XLA onto the MXU.
- Box math, anchor matching, multibox loss: fully-vectorized fixed-shape
  JAX ops (reference keeps these in per-image Python loops on CPU,
  lib/layers/box_utils.py:92, lib/layers/modules/multibox_loss.py:69).
- Detection post-processing (decode + per-class NMS) stays on-chip as
  batched fixed-iteration ops with an optional fused Pallas kernel
  (reference: Python while-loop NMS, lib/layers/box_utils.py:279).
- Data parallelism via jax.sharding.Mesh + jit sharding annotations;
  XLA inserts the gradient all-reduce over ICI (reference: single-process
  torch.nn.DataParallel, train.py:62).
"""

__version__ = "0.1.0"
