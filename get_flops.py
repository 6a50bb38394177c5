#!/usr/bin/env python
"""FLOPs reporter via XLA HLO cost analysis.

Parity target: /root/reference/get_flops.py (forward-hook MAC counting;
expected 31.386288 G for the default vgg16 SSD300, get_flops.py:70).
XLA counts 2 FLOPs per MAC, so the reference-comparable number is
cost['flops'] / 2e9.

Usage: python get_flops.py [--cfg cfgs/base/ssd_vgg16_voc.yml]
"""

from __future__ import annotations

import argparse
import os.path as osp


def model_cost(cfg):
    import jax
    import jax.numpy as jnp
    from odtpu.models import init_model, model_factory

    cfg.TPU.COMPUTE_DTYPE = "float32"  # count f32 flops like the reference
    model, priors, dims = model_factory("eval", cfg)
    variables = init_model(model, cfg)
    h, w = cfg.MODEL.IMAGE_SIZE
    x = jnp.zeros((1, h, w, 3), jnp.float32)

    lowered = jax.jit(
        lambda v, x: model.apply(v, x, phase="train", train=False)
    ).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    return cost, dims


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="")
    p.add_argument("--cfg_name", default="ssd_vgg16_voc")
    p.add_argument("--job_group", default="base")
    args = p.parse_args()

    from odtpu.utils.config import load_cfg
    cfg_path = args.cfg or osp.join("cfgs", args.job_group,
                                    args.cfg_name + ".yml")
    cfg = load_cfg(cfg_path if osp.isfile(cfg_path) else None)

    cost, dims = model_cost(cfg)
    flops = float(cost.get("flops", 0.0))
    print("feature maps:", dims)
    print("XLA flops: {:.6f} G".format(flops / 1e9))
    print("flops: {:.6f}".format(flops / 2e9),
          "(GMACs, comparable to reference get_flops.py)")
    for key in ("bytes accessed", "transcendentals"):
        if key in cost:
            print("{}: {:.3f} M".format(key, float(cost[key]) / 1e6))


if __name__ == "__main__":
    main()
