#!/usr/bin/env python
"""One-time converter: torch VGG16 'reduced fc' checkpoint -> neutral .npz.

The reference bootstraps training from vgg16_reducedfc.pth loaded into
model.base (train.py:75-85). This script converts that torch state dict
(Sequential indices) into '<conv_name>/kernel|bias' npz entries with
kernels transposed OIHW -> HWIO for NHWC Flax convs, so the framework
itself never depends on torch at runtime.

Usage:
    python tools/convert_torch_weights.py vgg16_reducedfc.pth vgg16.npz
"""

import sys

import numpy as np


def convert_vgg(src, dst):
    import torch
    from odtpu.models.vgg import TORCH_INDEX_TO_NAME
    sd = torch.load(src, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
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


if __name__ == "__main__":
    convert_vgg(sys.argv[1], sys.argv[2])
