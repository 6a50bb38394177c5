#!/usr/bin/env python
"""One-time converters: torch checkpoints -> neutral .npz param packs.

Two entry points:

1. Backbone bootstrap (`--mode vgg`, the default): converts the
   vgg16_reducedfc.pth state dict the reference trains from
   (train.py:75-85) into '<conv_name>/kernel|bias' entries consumed by
   odtpu.utils.checkpoint.load_backbone_npz.

2. Full model (`--mode ssd`): converts a complete trained reference
   SSD checkpoint ({'iteration','step_index','state_dict'} as written
   by reference train.py:211-213, or a bare state dict) into entries
   keyed by the odtpu param-tree path, consumed by
   odtpu.utils.checkpoint.load_model_npz — so detections from a
   reference-trained .pth can be reproduced without torch at runtime.

   Key mapping (reference lib/models/ssd_v3.py:47-64):
     base.N.weight/bias    -> backbone/<vgg conv name>/conv/kernel|bias
     L2Norm.weight         -> l2norm/scale
     extras.N.weight/bias  -> extras_N/conv/kernel|bias
     loc.N.weight/bias     -> head/loc_N/conv/kernel|bias
     conf.N.weight/bias    -> head/conf_N/conv/kernel|bias
   Kernels transpose OIHW -> HWIO (NHWC Flax convs); the head channel
   order (anchor-major a*4 / a*C) is preserved by the transpose, so
   flatten semantics match the reference's NCHW permute+reshape
   (ssd_v3.py:114-121) exactly. FPN checkpoints additionally map
   transforms.N/pyramids.N (fpn_v2.py:45-46) -> transform_N/pyramid_N.
   SSD_COCO shares the SSD layout. FSSD is deliberately unsupported:
   the reference's FSSD constructor is factory-incompatible
   (lib/models/fssd.py:8 vs lib/models/__init__.py:31), so no trained
   reference FSSD checkpoint can exist.

Usage:
    python tools/convert_torch_weights.py src.pth dst.npz [--mode vgg|ssd]
"""

import sys

import numpy as np


def _state_dict(src):
    import torch
    sd = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # tolerate DataParallel-wrapped saves
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_vgg(src, dst):
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from odtpu.models.vgg import TORCH_INDEX_TO_NAME
    sd = _state_dict(src)
    out = {}
    for key, tensor in sd.items():
        parts = key.split(".")
        # accept both '0.weight' (bare Sequential) and 'base.0.weight'
        idx_pos = 0 if parts[0].isdigit() else 1
        idx = int(parts[idx_pos])
        leaf = parts[idx_pos + 1]
        name = TORCH_INDEX_TO_NAME.get(idx)
        if name is None:
            print("skip", key)
            continue
        arr = tensor.numpy()
        if leaf == "weight":
            out[name + "/kernel"] = arr.transpose(2, 3, 1, 0)  # OIHW->HWIO
        elif leaf == "bias":
            out[name + "/bias"] = arr
    np.savez(dst, **out)
    print("wrote {} arrays to {}".format(len(out), dst))


def convert_ssd_state_dict(sd):
    """Reference SSD state dict (tensors or numpy arrays) -> dict keyed
    by odtpu param path. Pure-numpy core shared with the test layer."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from odtpu.models.vgg import TORCH_INDEX_TO_NAME
    out, skipped = {}, []
    for key, tensor in sd.items():
        arr = tensor if isinstance(tensor, np.ndarray) else tensor.numpy()
        parts = key.split(".")
        mod = parts[0]
        if mod == "base":
            name = TORCH_INDEX_TO_NAME.get(int(parts[1]))
            if name is None:
                skipped.append(key)
                continue
            path = "backbone/{}/conv/".format(name)
            leaf = parts[2]
        elif mod == "L2Norm":
            out["l2norm/scale"] = arr
            continue
        elif mod == "extras":
            path = "extras_{}/conv/".format(int(parts[1]))
            leaf = parts[2]
        elif mod in ("loc", "conf"):
            path = "head/{}_{}/conv/".format(mod, int(parts[1]))
            leaf = parts[2]
        elif mod in ("transforms", "pyramids"):
            # FPN laterals / output convs (fpn_v2.py:45-46), FSSD
            # transforms / pyramid convs (fssd.py:30-31)
            path = "{}_{}/conv/".format(mod[:-1], int(parts[1]))
            leaf = parts[2]
        else:
            skipped.append(key)
            continue
        if leaf == "weight":
            out[path + "kernel"] = arr.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            out[path + "bias"] = arr
        else:
            skipped.append(key)
    return out, skipped


def convert_ssd(src, dst):
    sd = _state_dict(src)
    out, skipped = convert_ssd_state_dict(sd)
    for key in skipped:
        print("skip", key)
    np.savez(dst, **out)
    print("wrote {} arrays to {}".format(len(out), dst))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="torch checkpoint (.pth)")
    ap.add_argument("dst", help="output .npz")
    ap.add_argument("--mode", choices=["vgg", "ssd"], default="vgg")
    args = ap.parse_args()
    (convert_ssd if args.mode == "ssd" else convert_vgg)(args.src, args.dst)
