#!/usr/bin/env python
"""Minimal reproducer for the composed-graph TPU worker fault.

Phenomenon (axon tunnel, TPU v5e, measured 2026-08-17 round 2): one jit
composing decode + exact top-k + the Pallas greedy-NMS kernel crashes
the remote TPU worker process-externally when the candidate-set count
is tiny (B=1 x 20 fg classes = 20 sets -> kernel grid of 2 rows-of-16),
while the SAME kernel runs bit-exact standalone at the same shapes
(S in {1, 8, 20, 80, 640}) and the SAME composed graph runs clean at
B=4 (80 sets) and above. Worker recovery takes minutes.

odtpu's production workaround pads the set axis up to the verified-clean
80 (odtpu/ops/detect.py _PALLAS_MIN_SETS); this script exists so the
platform claim stays re-verifiable / reportable upstream.

WARNING: on an affected platform THIS SCRIPT CRASHES THE TPU WORKER
(expect a hang or an abrupt process death; the chip takes several
minutes to come back). Run it only when you mean to.

Usage:
    python tools/repro_composed_fault.py              # the faulting shape
    python tools/repro_composed_fault.py --sets 80    # control: runs clean
    python tools/repro_composed_fault.py --standalone # kernel alone: clean
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
    p.add_argument("--sets", type=int, default=20,
                   help="candidate sets = B*(C-1); 20 faults, 80 is clean")
    p.add_argument("--classes", type=int, default=21,
                   help="num classes incl. background")
    p.add_argument("--standalone", action="store_true",
                   help="run only the NMS kernel (no decode/top-k "
                        "composition) — expected clean at every size")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from odtpu.ops.boxes import decode
    from odtpu.ops.pallas.nms_kernel import (nms_mask_pallas,
                                             per_class_nms_pallas)

    print("backend:", jax.default_backend(), "devices:", jax.devices())
    cf = args.classes - 1
    B = max(1, args.sets // cf)
    P, K = 8732, 200
    variances = (0.1, 0.2)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    if args.standalone:
        n = args.sets
        boxes = jnp.sort(jax.random.uniform(k1, (n, K, 4)), axis=-1)
        scores = -jnp.sort(-jax.random.uniform(k2, (n, K)), axis=-1)
        print("standalone kernel, {} sets ...".format(n))
        t0 = time.time()
        mask = nms_mask_pallas(boxes, scores, 0.45, 0.01)
        print("alive:", int(jnp.sum(mask)), "in %.2fs — CLEAN"
              % (time.time() - t0))
        return

    loc = jax.random.normal(k1, (B, P, 4)) * 0.1
    conf = jax.nn.softmax(jax.random.normal(k2, (B, P, args.classes)))
    cx = jax.random.uniform(k3, (P, 2), minval=0.1, maxval=0.9)
    priors = jnp.concatenate([cx, jnp.full((P, 2), 0.2)], axis=1)

    @jax.jit
    def composed(loc, conf, priors):
        decoded = decode(loc, priors[None], variances)
        # direct kernel call: bypasses the production set-padding in
        # odtpu.ops.detect._per_class_nms so the faulting grid is hit
        return per_class_nms_pallas(decoded, conf[..., 1:], 0.01, 0.45, K)

    print("composed decode+topk+pallas graph, B={} x {} fg classes = {} "
          "sets ...".format(B, cf, B * cf))
    print("(on an affected platform this call crashes the TPU worker)")
    t0 = time.time()
    out = composed(loc, conf, priors)
    s = float(jnp.sum(out[..., 0]))
    print("sum(scores)=%.4f in %.2fs — CLEAN (fault not reproduced)"
          % (s, time.time() - t0))


if __name__ == "__main__":
    main()
