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


def conv_breakdown(cfg):
    """Per-conv analytic MAC itemization, counted EXACTLY like the
    reference's forward-hook counter (flops_benchmark.py:162-193:
    2*k_h*k_w*Cin*Cout*Hout*Wout + Cout*Hout*Wout bias flops, then /2
    for MACs at get_flops.py:16). Shape-only (jax.eval_shape) — no
    compute. Returns (rows, total_gmacs) with rows of
    (path, kernel_shape, out_hw, gmacs)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from odtpu.models import model_factory

    cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, dims = model_factory("eval", cfg)
    h, w = cfg.MODEL.IMAGE_SIZE
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init(rng, x, train=False))

    def is_conv(mdl, method):
        return isinstance(mdl, nn.Conv)

    _, state = jax.eval_shape(lambda v: model.apply(
        v, x, phase="train", train=False,
        capture_intermediates=is_conv, mutable=["intermediates"]),
        variables)

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree

    # map module path -> captured conv output shape ('__call__' leaves
    # are tuples of outputs; nn.Conv has exactly one)
    outs = {}
    for path, leaf in walk(state["intermediates"]):
        mods = tuple(p for p in path if p != "__call__")
        if isinstance(leaf, (tuple, list)):
            leaf = leaf[0]
        outs[mods] = leaf.shape

    rows = []
    total_flops = 0.0
    params = variables["params"]
    for path, leaf in walk(params):
        if path[-1] != "kernel":
            continue
        mod_path = path[:-1]
        if mod_path not in outs:
            continue  # not a conv (e.g. Dense, none in this zoo)
        kh, kw, cin, cout = leaf.shape
        _, oh, ow, _ = outs[mod_path]
        flops = 2.0 * kh * kw * cin * cout * oh * ow
        has_bias = "bias" in _get(params, mod_path)
        if has_bias:
            flops += cout * oh * ow
        total_flops += flops
        rows.append(("/".join(mod_path), (kh, kw, cin, cout), (oh, ow),
                     flops / 2e9))
    return rows, total_flops / 2e9


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def elementwise_estimate(rows):
    """Analytic non-MAC flops the XLA count includes on top of the conv
    MACs: one ReLU compare per activated conv output element — every
    conv in this zoo is ReLU'd EXCEPT the loc/conf head convs — plus
    the L2Norm on the first (conv4_3-sized) source, ~5 flops/elem
    (square, sum, rsqrt, div, scale). Returns flops (not MACs)."""
    relu = sum(hw[0] * hw[1] * k[3] for name, k, hw, _ in rows
               if "head/" not in name)
    l2n = sum(5 * hw[0] * hw[1] * k[2] for name, k, hw, _ in rows
              if name.endswith("head/loc_0/conv"))  # source 0 elems
    return relu + l2n


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

    rows, conv_gmacs = conv_breakdown(cfg)
    print("per-conv MACs (reference hook formula, "
          "flops_benchmark.py:162-193):")
    for name, k, hw, g in rows:
        print("  {:40s} k={} out={}  {:.4f} G".format(name, k, hw, g))
    print("conv GMACs total: {:.6f}".format(conv_gmacs),
          "(== reference get_flops.py expected 31.386288 for the "
          "default SSD300-VGG16)")

    cost, dims = model_cost(cfg)
    flops = float(cost.get("flops", 0.0))
    print("feature maps:", dims)
    print("XLA flops: {:.6f} G".format(flops / 1e9))
    print("XLA as GMACs: {:.6f}".format(flops / 2e9))
    relu_flops = elementwise_estimate(rows)
    resid = flops - conv_gmacs * 2e9 - relu_flops
    print("XLA-vs-analytic delta (flops): relu/elementwise ~{:+.3f} G, "
          "residual {:+.3f} G".format(relu_flops / 1e9, resid / 1e9))
    print("  (the analytic conv total above is the parity oracle; the "
          "XLA aggregate is backend-dependent — fusion can count below "
          "the analytic MACs, padding/layout ops above)")
    for key in ("bytes accessed", "transcendentals"):
        if key in cost:
            print("{}: {:.3f} M".format(key, float(cost[key]) / 1e6))


if __name__ == "__main__":
    main()
