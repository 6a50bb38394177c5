#!/usr/bin/env python
"""Per-source feature-map shape reporter.

Parity target: /root/reference/get_featuremap_size.py (hook-based shape
dump); here the shapes come from jax.eval_shape — zero compute.
"""

from __future__ import annotations

import argparse
import os.path as osp


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="")
    p.add_argument("--cfg_name", default="ssd_vgg16_voc")
    p.add_argument("--job_group", default="base")
    args = p.parse_args()

    from odtpu.utils.config import load_cfg
    from odtpu.models import create_model
    import jax
    import jax.numpy as jnp

    cfg_path = args.cfg or osp.join("cfgs", args.job_group,
                                    args.cfg_name + ".yml")
    cfg = load_cfg(cfg_path if osp.isfile(cfg_path) else None)
    model, prior = create_model(cfg)
    h, w = cfg.MODEL.IMAGE_SIZE

    def f(x):
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model.apply(variables, x, train=False, return_sources=True,
                           mutable=False)[-1]

    shapes = jax.eval_shape(f, jax.ShapeDtypeStruct((1, h, w, 3),
                                                    jnp.float32))
    print("input: ({}, {}, 3)".format(h, w))
    for i, (s, a) in enumerate(zip(shapes, prior.num_priors)):
        print("source {}: {} x {} x {}ch  ({} anchors/cell -> {} priors)"
              .format(i, s.shape[1], s.shape[2], s.shape[3], a,
                      a * s.shape[1] * s.shape[2]))
    total = sum(a * s.shape[1] * s.shape[2]
                for s, a in zip(shapes, prior.num_priors))
    print("total priors:", total)


if __name__ == "__main__":
    main()
