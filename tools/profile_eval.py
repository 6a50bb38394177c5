#!/usr/bin/env python
"""Per-stage on-chip timing of the SSD300 eval pipeline.

Tunnel-safe by construction: the input batch is generated ON DEVICE by
a jitted producer (no bulk H2D), and every timed iteration syncs by
reading ONE scalar to the host (the only reliable sync on axon; bulk
D2H can wedge). A no-op jit loop measures the dispatch+sync round-trip
so per-stage times can be read net of tunnel overhead.

Stages: forward / decode / top-k / Pallas NMS / full detect / fused
forward+detect. Used for the VERDICT-r1 MFU breakdown (BENCH_NOTES.md).

Usage: python tools/profile_eval.py [--batch 32] [--iters 10]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main():
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="",
                   help="yaml to profile a non-default spec (e.g. "
                        "cfgs/vgg/ssd_vgg16_voc_image512.yml)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impl", default="auto", choices=["auto", "pallas",
                                                      "lax"])
    p.add_argument("--quant", default="", choices=["", "int8"],
                   help="run the forward in quantized serving mode")
    p.add_argument("--barrier", action="store_true",
                   help="optimization_barrier between forward and "
                        "detect in the chained fused measurement")
    p.add_argument("--stages_chained", action="store_true",
                   help="also time each stage chained x20 inside one "
                        "jit (RTT-free, immune to tunnel phases)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from odtpu.models import model_factory
    from odtpu.ops.boxes import decode
    from odtpu.ops.detect import _per_class_nms, detect_out
    from odtpu.utils.config import default_cfg, load_cfg

    cfg = load_cfg(args.cfg) if args.cfg else default_cfg()
    if jax.default_backend() != "tpu":
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model, priors, _ = model_factory("eval", cfg)
    from odtpu.models.common import quantized

    def apply_eval(v, x):
        with quantized(args.quant):
            return model.apply(v, x, phase="eval", train=False)
    variances = tuple(float(v) for v in cfg.MODEL.VARIANCE)
    B = args.batch
    h, w = cfg.MODEL.IMAGE_SIZE

    # everything device-side: init + input batch from an on-device RNG
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3), jnp.float32),
                             train=False))(jax.random.PRNGKey(0))
    make_x = jax.jit(lambda k: jax.random.uniform(
        k, (B, h, w, 3), jnp.float32, -110.0, 145.0))
    x = make_x(jax.random.PRNGKey(1))
    priors_d = jax.device_put(jnp.asarray(priors))  # 140 KB, one-shot

    def sync(v):
        return float(jnp.sum(v[..., 0] if v.ndim > 1 else v)
                     if not isinstance(v, tuple)
                     else jnp.sum(v[0][..., 0]))

    def timeit(name, fn, *fargs, calibration=0.0):
        out = fn(*fargs)
        sync(out)  # compile + settle
        sync(fn(*fargs))
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*fargs)
            sync(out)
        dt = (time.time() - t0) / args.iters * 1000
        net = max(dt - calibration, 0.0)
        print("{:34s} {:8.2f} ms gross {:8.2f} ms net {:7.0f} img/s"
              .format(name, dt, net, B / max(net, 1e-9) * 1000))
        return net

    # dispatch+sync round-trip baseline on a tiny array
    tiny = jnp.zeros((8,), jnp.float32)
    rtt = timeit("noop (dispatch+sync RTT)",
                 jax.jit(lambda t: t + 1.0), tiny)

    fwd = jax.jit(apply_eval)
    loc, conf = fwd(variables, x)
    jnp.asarray(loc).block_until_ready()

    timeit("forward", fwd, variables, x, calibration=rtt)
    dec = jax.jit(lambda l, p: decode(l, p[None], variances))
    decoded = dec(loc, priors_d)
    timeit("decode", dec, loc, priors_d, calibration=rtt)
    tk = jax.jit(lambda c: jax.lax.top_k(
        jnp.moveaxis(c[..., 1:], -1, 1).reshape(-1, c.shape[1]), 200)[0])
    timeit("top_k {}x{}->200".format(B * (conf.shape[-1] - 1),
                                     conf.shape[1]), tk, conf,
           calibration=rtt)
    pcn = jax.jit(lambda d, c: _per_class_nms(
        d, c[..., 1:], 0.01, 0.45, 200, args.impl))
    timeit("per-class NMS (incl top_k)", pcn, decoded, conf,
           calibration=rtt)
    det = jax.jit(lambda l, c, p: detect_out(l, c, p, variances,
                                             impl=args.impl))
    timeit("detect_out full", det, loc, conf, priors_d, calibration=rtt)
    full = jax.jit(lambda v, x, p: detect_out(
        *apply_eval(v, x), p, variances, impl=args.impl))
    timeit("forward+detect fused", full, variables, x, priors_d,
           calibration=rtt)

    # RTT-free on-chip number: chain N pipeline iterations inside ONE
    # jit (a data dependence through the carry stops CSE/hoisting), so
    # the tunnel round-trip amortizes to nothing
    N_CHAIN = 20

    def chain_time(name, body_fn, *xs):
        """Time body_fn chained N_CHAIN times inside one jit: immune to
        tunnel phase noise (one dispatch per N_CHAIN iterations). The
        scalar result feeds back into the first operand so XLA cannot
        hoist or CSE the repeated body."""
        @jax.jit
        def chained(*xs):
            def body(i, carry):
                x0, acc = carry
                s = body_fn(x0, *xs[1:])
                return x0 + s * 1e-30, acc + s
            return jax.lax.fori_loop(0, N_CHAIN, body, (xs[0], 0.0))[1]
        float(chained(*xs))  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(chained(*xs))
        ms = (time.time() - t0) / reps / N_CHAIN * 1000
        print("{:34s} {:8.2f} ms/iter on-chip {:7.0f} img/s".format(
            name + " chained", ms, B / ms * 1000))
        return ms

    if args.stages_chained:
        from odtpu.ops.topk import top_k_exact
        Cf = conf.shape[-1] - 1
        chain_time("forward",
                   lambda xc, v: jnp.sum(apply_eval(v, xc)[0][:, 0, 0]),
                   x, variables)
        chain_time("decode",
                   lambda l, p: jnp.sum(
                       decode(l, p[None], variances)[:, 0, 0]),
                   loc, priors_d)
        chain_time("top_k_exact {}x{}->200".format(B * Cf, conf.shape[1]),
                   lambda c: jnp.sum(top_k_exact(
                       jnp.moveaxis(c[..., 1:], -1, 1)
                       .reshape(-1, c.shape[1]), 200)[0][:, 0]),
                   conf)
        # NMS sub-stages: per-image gather of top-200 boxes (the
        # production layout — operand [B, P, 4], indices [B, Cf*200];
        # per_class_nms_pallas), the Pallas alive-mask alone, and the
        # survivors-first compaction (argsort + 3 gathers)
        Cfg = conf.shape[-1] - 1
        sb = jnp.moveaxis(conf[..., 1:], -1, 1).reshape(B * Cfg, -1)
        tsc, order = top_k_exact(sb, 200)
        tbx = jnp.take_along_axis(
            decoded, order.reshape(B, Cfg * 200)[..., None],
            axis=1).reshape(B * Cfg, 200, 4)
        chain_time("  boxes gather [B,P,4]->[B,Cf*200,4]",
                   lambda o, dec: jnp.sum(jnp.take_along_axis(
                       dec, o.astype(jnp.int32).reshape(
                           B, Cfg * 200)[..., None],
                       axis=1)[:, 0, 0]),
                   order.astype(jnp.float32), decoded)
        if args.impl != "lax":
            from odtpu.ops.pallas.nms_kernel import nms_mask_pallas
            chain_time("  pallas alive mask",
                       lambda s, bx: jnp.sum(nms_mask_pallas(
                           bx, s, 0.45, 0.01).astype(jnp.float32)),
                       tsc, tbx)
        def _compaction(s, alive_f, bx):
            alive = alive_f > 0.5
            perm = jnp.argsort(~alive, axis=1, stable=True)
            a = jnp.take_along_axis(alive, perm, axis=1).astype(s.dtype)
            rs = jnp.take_along_axis(s, perm, axis=1) * a
            rb = jnp.take_along_axis(bx, perm[..., None], axis=1) \
                * a[..., None]
            return jnp.sum(rs) + jnp.sum(rb[:, 0, 0])
        alive_f = (tsc > 0.01).astype(jnp.float32)
        chain_time("  compaction (argsort+gathers)",
                   _compaction, tsc, alive_f, tbx)
        chain_time("per-class NMS (incl top_k)",
                   lambda d, c: jnp.sum(_per_class_nms(
                       d, c[..., 1:], 0.01, 0.45, 200,
                       args.impl)[:, :, 0, 0]),
                   decoded, conf)
        chain_time("detect_out full",
                   lambda l, c, p: jnp.sum(detect_out(
                       l, c, p, variances,
                       impl=args.impl)[:, 1:, 0, 0]),
                   loc, conf, priors_d)

    def make_chained(barrier):
        @jax.jit
        def chained(v, x0, p):
            def body(i, carry):
                xc, acc = carry
                lc, cf = apply_eval(v, xc)
                if barrier:
                    # materialization boundary between forward and
                    # detect: isolates whether cross-fusion costs more
                    # than the sum of the separately-compiled stages
                    lc, cf = jax.lax.optimization_barrier((lc, cf))
                out = detect_out(lc, cf, p, variances, impl=args.impl)
                s = jnp.sum(out[:, 1:, 0, 0])
                return xc + s * 1e-30, acc + s
            return jax.lax.fori_loop(0, N_CHAIN, body, (x0, 0.0))[1]
        return chained

    variants = [(False, "")] + ([(True, " +barrier")] if args.barrier
                                else [])
    for barrier, tag in variants:
        chained = make_chained(barrier)
        float(chained(variables, x, priors_d))  # compile
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            float(chained(variables, x, priors_d))
        per_iter = (time.time() - t0) / reps / N_CHAIN * 1000
        print("{:34s} {:8.2f} ms/iter on-chip {:7.0f} img/s".format(
            "forward+detect chained x{}{}".format(N_CHAIN, tag),
            per_iter, B / per_iter * 1000))


if __name__ == "__main__":
    main()
