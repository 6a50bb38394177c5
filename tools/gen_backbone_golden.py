#!/usr/bin/env python
"""Regenerate tests/goldens/vgg16_backbone_features.npz.

Runs the TORCH side of the pretrained-backbone chain (deterministic
numpy weights -> torch VGG16 reduced-fc forward) at a small input size
and stores input + conv4_3/conv7 feature maps (NHWC). The torch-free
test tests/test_backbone_import.py::test_backbone_golden_features then
checks the Flax side against these, so conv/pool/dilation semantics stay
pinned even if torch is unavailable.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))


def main(seed=0):
    import torch
    from test_backbone_import import build_torch_vgg, make_weights

    weights = make_weights(seed=seed)
    net = build_torch_vgg(weights)
    rs = np.random.RandomState(42)
    x = rs.randn(1, 3, 64, 64).astype(np.float32) * 50.0
    with torch.no_grad():
        t43 = net[:23](torch.from_numpy(x)).numpy()
        t7 = net(torch.from_numpy(x)).numpy()
    out = osp.join(osp.dirname(osp.abspath(__file__)), "..", "tests",
                   "goldens", "vgg16_backbone_features.npz")
    np.savez_compressed(
        out, seed=seed, x=x.transpose(0, 2, 3, 1),
        conv4_3=t43.transpose(0, 2, 3, 1), conv7=t7.transpose(0, 2, 3, 1))
    print("wrote", osp.abspath(out), "conv4_3", t43.shape, "conv7", t7.shape)


if __name__ == "__main__":
    main()
