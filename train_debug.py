#!/usr/bin/env python
"""Debug entry: build everything, run ONE training forward/backward and
one eval pass, then exit — "does the pipeline run" smoke.

Parity target: /root/reference/train_debug.py (train.py with the
optimizer step disabled and an immediate return after the first eval).
"""

from __future__ import annotations

import argparse
import os.path as osp


def main(argv=None):
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_name", default="")
    p.add_argument("--job_group", default="")
    p.add_argument("--cfg", default="")
    args = p.parse_args(argv)

    import jax
    from odtpu.data import dataset_factory
    from odtpu.eval import eval_solver_factory
    from odtpu.models import model_factory
    from odtpu.parallel import (create_train_state, make_eval_step,
                                make_mesh, make_train_step, shard_batch)
    from odtpu.utils.config import load_cfg

    from odtpu.utils.config import resolve_cfg_args
    cfg_path = resolve_cfg_args(args)
    cfg = load_cfg(cfg_path if osp.isfile(cfg_path) else None)
    mesh = make_mesh(cfg)
    print("mesh:", dict(mesh.shape))

    model, priors, dims = model_factory("train", cfg)
    print("feature maps:", dims)
    state, tx = create_train_state(model, cfg, mesh=mesh)
    step_fn = make_train_step(model, priors, cfg, tx, mesh=mesh)
    eval_fn = make_eval_step(model, priors, cfg, mesh=mesh)

    train_loader = dataset_factory("train", cfg)
    batch = next(iter(train_loader))
    sharded = shard_batch((batch["images"], batch["boxes"],
                           batch["labels"]), mesh)
    state, metrics = step_fn(state, *sharded)
    print("one step: loss={:.4f} loc={:.4f} conf={:.4f} npos={}".format(
        float(metrics["loss"]), float(metrics["loss_loc"]),
        float(metrics["loss_conf"]), int(metrics["num_pos"])))

    if cfg.LOG.SHOW_SALIENCY:
        # input-gradient saliency per source map (reference
        # visualize_utils.py:152-202 viz_module_grads)
        import jax.numpy as jnp
        import numpy as np
        from odtpu.utils.logging import TBWriter
        from odtpu.utils.visualize import viz_grads

        tb = TBWriter(osp.join("debug_eval_out", "tb"))
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        def source_fn(x):
            out = model.apply(variables, x, phase="eval", train=False,
                              return_sources=True)
            return out[-1]

        img = batch["images"][:1]
        if img.dtype == np.uint8:  # device-photometric loader output
            img = (img.astype(np.float32)
                   - np.asarray(cfg.DATASET.PIXEL_MEANS, np.float32))
            img = img[..., ::-1]
        viz_grads(source_fn, jnp.asarray(img), cfg.DATASET.PIXEL_MEANS, tb)
        tb.close()
        print("saliency maps written to debug_eval_out/tb")

    val_loader = dataset_factory("eval", cfg)
    solver = eval_solver_factory(val_loader, cfg, "debug_eval_out")
    res, maps = solver.validate(eval_fn, state.params, state.batch_stats)
    print("eval ok: mAP", maps, "timing", solver.last_timing)


if __name__ == "__main__":
    main()
