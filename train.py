#!/usr/bin/env python
"""Training entry point.

Parity target: /root/reference/train.py — same CLI shape
(--cfg_name/--job_group select cfgs/<group>/<name>.yml; --resume;
--basenet) and the same training contract: SGD step decay, loss logging
every LOG_LOSS_ITER, checkpoint every SAVE_ITER, in-training eval every
EVAL_ITER, stop at MAX_ITER.

TPU-native execution: one jitted SPMD train step over a
jax.sharding.Mesh; the host loop only feeds sharded batches and reads
metrics (asynchronously — metrics from step N are consumed at N+log
interval so the device never stalls on the host).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="odtpu training")
    p.add_argument("--cfg_name", default="",
                   help="yaml name under cfgs/<job_group>/ "
                        "(default ssd_vgg16_voc)")
    p.add_argument("--job_group", default="", help="default: base")
    p.add_argument("--cfg", default="", help="explicit yaml path "
                   "(run naming derives from it unless "
                   "--cfg_name/--job_group are also given)")
    p.add_argument("--resume", default="", help="checkpoint dir to resume")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from <output_dir>/ckpt when a checkpoint "
                        "exists there, else start fresh (honoring "
                        "--basenet). Makes a queued contract run "
                        "idempotent: a supervisor can kill a wedged "
                        "process and re-run the identical command "
                        "without losing completed iterations.")
    p.add_argument("--basenet", default="",
                   help="converted backbone weights .npz")
    p.add_argument("--output_dir", default="")
    p.add_argument("--max_iter", type=int, default=0,
                   help="override cfg.TRAIN.MAX_ITER")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-slice "
                        "DCN training; each host loads its data shard)")
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of steps 10-20")
    p.add_argument("--max_rss_gb", type=float,
                   default=float(os.environ.get("ODTPU_MAX_RSS_GB", 64)),
                   help="host-RSS ceiling: at the next SAVE_ITER past "
                        "this, save and re-exec with --resume (the axon "
                        "tunnel retains H2D staging memory ~= bytes "
                        "transferred; a 6k-iter SSD512 run was OOM-"
                        "killed at 130 GB — tools/probe_h2d_leak.py). "
                        "0 disables.")
    return p.parse_args(argv)


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / (1024.0 ** 2)
    return 0.0


def _resume_argv(argv, ckpt_dir):
    """argv with any --basenet/--resume (space or '=' form) stripped and
    --resume <ckpt_dir> appended: the checkpoint carries the full
    TrainState, so a re-exec must not re-apply the basenet import."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--basenet", "--resume"):
            skip = True
            continue
        if a.startswith("--basenet=") or a.startswith("--resume="):
            continue
        out.append(a)
    return out + ["--resume", ckpt_dir]


def setup(args):
    from odtpu.utils.config import load_cfg
    from odtpu.utils.config import resolve_cfg_args
    cfg_path = resolve_cfg_args(args)
    cfg = load_cfg(cfg_path if osp.isfile(cfg_path) else None)
    if not osp.isfile(cfg_path):
        print("config {} not found; using defaults".format(cfg_path))
    if args.max_iter:
        cfg.TRAIN.MAX_ITER = args.max_iter
    name = args.cfg_name
    out = args.output_dir or osp.join(cfg.GENERAL.WEIGHTS_ROOT,
                                      args.job_group, name)
    if osp.isdir(out) and os.listdir(out) and not args.resume:
        # reference warns (and sleeps 10s) before reusing an experiment
        # dir (lib/utils/utils.py:56-64); we warn without the sleep
        print("WARNING: output dir {} already exists — checkpoints/logs "
              "may be overwritten".format(out))
    os.makedirs(out, exist_ok=True)
    log_dir = osp.join(cfg.LOG.ROOT_DIR,
                       "{}_{}".format(args.job_group, name))
    return cfg, out, log_dir


def main(argv=None):
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    args = parse_args(argv)
    if args.multihost:
        jax.distributed.initialize()
        print("process {}/{}".format(jax.process_index(),
                                     jax.process_count()))
    cfg, out_dir, log_dir = setup(args)
    if args.auto_resume and not args.resume:
        _ck = osp.join(out_dir, "ckpt")
        if osp.isdir(_ck) and any(s.isdigit() for s in os.listdir(_ck)):
            args.resume = _ck
            print("auto-resume: checkpoint found under", _ck)

    from odtpu.data import dataset_factory
    from odtpu.eval import eval_solver_factory
    from odtpu.models import model_factory
    from odtpu.parallel import (create_train_state, make_eval_step,
                                make_mesh, make_train_step, shard_batch)
    from odtpu.utils.checkpoint import (Checkpointer, load_backbone_npz,
                                        load_model_npz)
    from odtpu.utils.logging import TBWriter, Timer

    print("devices:", jax.devices())
    mesh = make_mesh(cfg)
    print("mesh:", dict(mesh.shape))

    train_loader = dataset_factory("train", cfg)
    val_loader = dataset_factory("eval", cfg)
    eval_solver = eval_solver_factory(val_loader, cfg,
                                      osp.join(out_dir, "eval"))

    model, priors, layer_dims = model_factory("train", cfg)
    print("feature maps:", layer_dims, "priors:", priors.shape)

    state, tx = create_train_state(model, cfg, mesh=mesh)
    if args.basenet:
        from odtpu.parallel.mesh import shard_params
        # Two npz schemes: converted torch backbones use bare
        # '<conv>/kernel' keys (load_backbone_npz); full-model exports
        # from tools/ckpt_to_npz.py use '/'-joined odtpu param paths.
        # Full-path keys partial-load by exact path+shape, so pointing
        # --basenet at a trained flagship export transfers exactly the
        # shared trunk (the 15 VGG convs; L2Norm scales keep their
        # 10/8 inits — the export names the flagship's 'l2norm/scale'
        # while e.g. RefineDet names its norms 'l2norm_4_3') into a new
        # family — the TPU-native analog of the reference's
        # pretrained-VGG protocol (train.py:79-85 partial state_dict
        # load). Scheme detection is structural: backbone exports are
        # 2-segment '<conv>/<leaf>' keys, full-path exports are >=3
        # segments — one coincidental top-level key must not flip the
        # mode (a bare-backbone npz with a stray key would silently
        # skip every conv in full-path mode).
        import numpy as _np
        with _np.load(args.basenet) as _data:
            _keys = list(_data.files)
        _full_path = (sum(len(k.split("/")) >= 3 for k in _keys)
                      > len(_keys) // 2)
        _loader = load_model_npz if _full_path else load_backbone_npz
        params, loaded, skipped = _loader(
            jax.device_get(state.params), args.basenet)
        print("basenet import ({}): {} loaded, {} skipped".format(
            "full-path" if _full_path else "backbone", len(loaded),
            len(skipped)))
        if not loaded:
            raise ValueError(
                "--basenet {} matched no parameters (detected {} "
                "scheme; sample npz keys: {})".format(
                    args.basenet,
                    "full-path" if _full_path else "backbone",
                    ", ".join(skipped[:5])))
        # re-place with the mesh layout create_train_state chose: a bare
        # device_put would drop the NamedShardings (TP layouts) while the
        # optimizer momentum buffers keep theirs
        state = state.replace(params=shard_params(params, mesh))

    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    start_step = 0
    if args.resume:
        restored = Checkpointer(args.resume).restore(state)
        # restore() returns host numpy trees; re-apply the exact mesh
        # placement create_train_state chose (the TP layout rule is
        # shape-based, so shard_params covers params, momentum buffers
        # and batch stats uniformly). Without this, MESH_MODEL>1 resume
        # would silently drop the tensor-parallel layout and let GSPMD
        # re-place arbitrarily. (Reference resume: train.py:67-72.)
        from odtpu.parallel.mesh import shard_params
        state = shard_params(restored, mesh)
        start_step = int(np.asarray(state.step))
        print("resumed at step", start_step)

    step_fn = make_train_step(model, priors, cfg, tx, mesh=mesh)
    eval_fn = make_eval_step(model, priors, cfg, mesh=mesh)
    tb = TBWriter(log_dir)

    if cfg.LOG.SHOW_AUG_STEPS:
        # per-stage augmentation dumps (ref augmentations.py:395-404)
        train_loader.transform.attach_writer(tb)
    if cfg.LOG.SHOW_ANCHOR_MAPS:
        # per-feature-map anchor renderings (ref prior_box.py:55-90)
        from odtpu.ops import PriorBoxSSD
        from odtpu.utils.visualize import viz_prior_anchors
        viz_prior_anchors(PriorBoxSSD(cfg), layer_dims, tb)

    max_iter = int(cfg.TRAIN.MAX_ITER)
    log_every = int(cfg.TRAIN.LOG_LOSS_ITER)
    save_every = int(cfg.TRAIN.SAVE_ITER)
    eval_every = int(cfg.TRAIN.EVAL_ITER)

    # archive the effective config with the run (reference backup_jobs,
    # train.py:197-208 — done up front so crashes still leave a record)
    import yaml as _yaml

    def _plain(x):
        if isinstance(x, dict):
            return {k: _plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_plain(v) for v in x]
        return x if isinstance(x, (int, float, bool, str, type(None))) \
            else str(x)

    with open(osp.join(out_dir, "config_used.yml"), "w") as f:
        _yaml.safe_dump(_plain(cfg), f)

    import time
    it = start_step
    last_log_iter, last_log_time = start_step, time.time()
    timer = Timer()
    pending = None  # (step, metrics) not yet consumed
    profiling = False
    while it < max_iter:
        for batch in train_loader:
            if it >= max_iter:
                break
            if args.profile_dir and it == 10 and not profiling:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            if profiling and it == 20:
                jax.profiler.stop_trace()
                profiling = False
                print("profiler trace written to", args.profile_dir)
            timer.tic()
            sharded = shard_batch(
                (batch["images"], batch["boxes"], batch["labels"]), mesh)
            state, metrics = step_fn(state, *sharded)
            it += 1
            if it == start_step + 1:
                # sync once so the first throughput window doesn't bill
                # the jit compile to the train steps
                jax.device_get(metrics)
                last_log_iter, last_log_time = it, time.time()
            if pending is not None and pending[0] % log_every == 0:
                # device_get of the one-step-old metrics SYNCS on that
                # step's completion, so wall time between consumption
                # points divided by the steps dispatched in between is
                # true device throughput (the round-1 log timed only
                # the async dispatch — wrong by the queue depth)
                m = jax.device_get(pending[1])
                now = time.time()
                steps_done = pending[0] - last_log_iter
                ips = (steps_done * batch["images"].shape[0]
                       / max(now - last_log_time, 1e-9))
                last_log_iter, last_log_time = pending[0], now
                print("iter {} | loss {:.4f} (loc {:.4f} conf {:.4f}) "
                      "| {:.1f} img/s".format(
                          pending[0], float(m["loss"]), float(m["loss_loc"]),
                          float(m["loss_conf"]), ips))
                tb.add_scalars("train", {
                    "loss": float(m["loss"]),
                    "loc_loss": float(m["loss_loc"]),
                    "conf_loss": float(m["loss_conf"]),
                    "img_per_sec": ips,
                    "time": timer.diff}, pending[0])
            pending = (it, metrics)
            timer.toc(average=False)

            if it % save_every == 0 or it == max_iter:
                ckpt.save(it, state)
                print("saved checkpoint at", it)
                if (args.max_rss_gb and it < max_iter
                        and not args.multihost
                        and _rss_gb() > args.max_rss_gb):
                    # Host RSS grows ~linearly with bytes shipped to the
                    # device on this tunnel (staging retention measured
                    # by tools/probe_h2d_leak.py; the first ssd512_ft
                    # run died at 130 GB anon RSS, iter 4960). The save
                    # above is synchronous and resume is proven
                    # bit-deterministic (BENCH_NOTES round-3 crash/
                    # resume), so replace the process image in place:
                    # execv frees every leaked page while keeping one
                    # train.py invocation == one contract run.
                    print("RSS {:.1f} GB > --max_rss_gb {:.0f}; "
                          "re-exec with --resume at iter {}".format(
                              _rss_gb(), args.max_rss_gb, it), flush=True)
                    tb.close()
                    new_argv = _resume_argv(
                        list(argv) if argv is not None else sys.argv[1:],
                        osp.join(out_dir, "ckpt"))
                    os.execv(sys.executable,
                             [sys.executable, sys.argv[0]] + new_argv)
                # reset the throughput window: save time isn't step time
                last_log_iter, last_log_time = it, time.time()
            if it % eval_every == 0 or it == max_iter:
                res, maps = eval_solver.validate(
                    eval_fn, state.params, state.batch_stats, tb_writer=tb)
                print("iter {} | mAP {}".format(it, maps))
                tb.add_scalar("mAP/mAP@0.5", maps[0], it)
                if len(maps) > 1:
                    tb.add_scalar("mAP/mAP@[.5:.95]", maps[1], it)
                # reset the throughput window: the eval pass (and its
                # compiles) would otherwise be billed to train steps
                last_log_iter, last_log_time = it, time.time()

    ckpt.save(max_iter, state, force=True)
    tb.close()
    backup_jobs(cfg, out_dir, log_dir, args)
    print("done at iter", it)


def backup_jobs(cfg, out_dir, log_dir, args):
    """Archive the effective config + TB event logs to
    history/<job_group>/<cfg_name> at end of run (reference backup_jobs,
    /root/reference/train.py:197-208, including its rename-with-_n
    behavior when the history dir already exists)."""
    import shutil

    dst = osp.join(cfg.GENERAL.HISTORY_ROOT, args.job_group, args.cfg_name)
    if osp.exists(dst):
        # first free numbered suffix, so a third run of the same cfg
        # never merges into an earlier backup (the reference also
        # increments, utils.py rename-with-_n)
        n = 1
        while osp.exists("{}_{}".format(dst, n)):
            n += 1
        dst = "{}_{}".format(dst, n)
        print("history dir exists; backing up as", dst)
    os.makedirs(dst, exist_ok=True)
    cfg_file = osp.join(out_dir, "config_used.yml")
    if osp.isfile(cfg_file):
        shutil.copyfile(cfg_file, osp.join(dst, args.cfg_name + ".yml"))
    if osp.isdir(log_dir):
        shutil.copytree(log_dir, dst, dirs_exist_ok=True)
    print("backed up cfg and TB logs to", dst)


if __name__ == "__main__":
    main()
