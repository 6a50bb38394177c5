#!/usr/bin/env python
"""Evaluation entry point (parity: /root/reference/eval.py).

Loads a checkpoint, runs the batched eval pipeline (forward + on-chip
decode/NMS) over the test set, prints per-class AP and mAP.
"""

from __future__ import annotations

import argparse
import os.path as osp

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="odtpu evaluation")
    p.add_argument("--cfg_name", default="",
                   help="default ssd_vgg16_voc; with --cfg, derived "
                        "from the yaml path unless given explicitly")
    p.add_argument("--job_group", default="", help="default: base")
    p.add_argument("--cfg", default="")
    p.add_argument("--ckpt", required=False, default="",
                   help="checkpoint dir (weights/<group>/<name>/ckpt by "
                        "default)")
    p.add_argument("--output_dir", default="eval_out")
    p.add_argument("--model_npz", default="",
                   help="converted reference model .npz "
                        "(tools/convert_torch_weights.py --mode ssd)")
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="quantized serving compute (overrides TPU.QUANT); "
                        "'int8' runs convs on the s8 MXU path")
    return p.parse_args(argv)


def main(argv=None):
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    args = parse_args(argv)
    from odtpu.data import dataset_factory
    from odtpu.eval import eval_solver_factory
    from odtpu.models import model_factory
    from odtpu.parallel import (create_train_state, make_eval_step,
                                make_mesh)
    from odtpu.utils.config import load_cfg

    from odtpu.utils.config import resolve_cfg_args
    cfg_path = resolve_cfg_args(args)
    cfg = load_cfg(cfg_path if osp.isfile(cfg_path) else None)
    if args.quant:
        cfg.TPU.QUANT = args.quant
    mesh = make_mesh(cfg)

    loader = dataset_factory("eval", cfg)
    solver = eval_solver_factory(loader, cfg, args.output_dir)
    model, priors, _ = model_factory("eval", cfg)
    state, _ = create_train_state(model, cfg, mesh=mesh)

    if args.model_npz:
        # converted reference checkpoint (tools/convert_torch_weights.py
        # --mode ssd) or a ckpt_to_npz export: the route for evaluating
        # a persisted artifact without orbax/torch at runtime. Carries
        # BN batch_stats when present (__batch_stats__/ namespace) —
        # required for the BN-heavy families (RFBNet/FSSD/DRN).
        from odtpu.parallel.mesh import shard_params
        from odtpu.utils.checkpoint import load_variables_npz
        host_vars = {"params": jax.device_get(state.params)}
        if state.batch_stats:
            host_vars["batch_stats"] = jax.device_get(state.batch_stats)
        new_vars, loaded, skipped = load_variables_npz(
            host_vars, args.model_npz)
        print("model import: {} loaded, {} skipped".format(
            len(loaded), len(skipped)))
        if skipped:
            print("  skipped:", ", ".join(skipped[:8]),
                  "..." if len(skipped) > 8 else "")
        state = state.replace(
            params=shard_params(new_vars["params"], mesh),
            batch_stats=(shard_params(new_vars["batch_stats"], mesh)
                         if "batch_stats" in new_vars
                         else state.batch_stats))
    else:
        ckpt_dir = args.ckpt or osp.join(cfg.GENERAL.WEIGHTS_ROOT,
                                         args.job_group, args.cfg_name,
                                         "ckpt")
        if osp.isdir(ckpt_dir):
            # shared partial-restore protocol (checkpoint.py): eval
            # needs params/batch_stats/step only, never the opt chain
            from odtpu.parallel.mesh import shard_params
            from odtpu.utils.checkpoint import restore_partial
            step, params, batch_stats = restore_partial(
                ckpt_dir, jax.device_get(state.params),
                jax.device_get(state.batch_stats)
                if state.batch_stats else None)
            state = state.replace(
                step=step,
                params=shard_params(params, mesh),
                batch_stats=(shard_params(batch_stats, mesh)
                             if batch_stats else state.batch_stats))
            print("restored step", int(np.asarray(state.step)))
        else:
            print("WARNING: no checkpoint at {}; evaluating random init"
                  .format(ckpt_dir))

    eval_fn = make_eval_step(model, priors, cfg, mesh=mesh)
    res, maps = solver.validate(eval_fn, state.params, state.batch_stats)
    if isinstance(res, list) and res and isinstance(res[0], tuple):
        for cls, ap, _, _ in res:
            print("AP for {} = {:.4f}".format(cls, ap))
    print("mAP:", maps)
    print("timing:", solver.last_timing)


if __name__ == "__main__":
    main()
