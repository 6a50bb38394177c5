#!/usr/bin/env python
"""Sweep the two-level top-k group count on hardware.

The detect tail's biggest piece at SSD512 shapes is the exact top-k over
24,564 priors (BENCH_NOTES round-4 stage profile: 8.8 ms of the 15.8 ms
detect at B=32). `top_k_exact`'s group heuristic was tuned at the
SSD300 shape (P=8732 -> G=16); this sweeps G at any [rows, P] shape so
the heuristic can be grounded in measurement per shape. Chained-in-one-
jit timing (data dependence through the carry), scalar-read sync — the
same method as tools/profile_eval.py.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

from odtpu.utils.platform import apply_platform_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=640,
                    help="candidate sets (B * (C-1)); 640 = B32 VOC")
    ap.add_argument("--n", type=int, default=24564,
                    help="prior count (24564 = SSD512, 8732 = SSD300)")
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from odtpu.ops.topk import top_k_exact

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.rows, args.n).astype(np.float32))

    def timed(groups):
        def one(xi):
            if groups == 0:
                return jax.lax.top_k(xi, args.k)
            return top_k_exact(xi, args.k, groups=groups)

        @jax.jit
        def chained(x0):
            def body(i, carry):
                xc, acc = carry
                v, idx = one(xc)
                # consume BOTH outputs: the detect path gathers boxes
                # by the returned indices, so a values-only carry would
                # let XLA DCE the index side and flatter whichever
                # variant computes indices lazily
                s = jnp.sum(v[:, 0]) + jnp.sum(idx[:, 0]).astype(
                    jnp.float32) * 1e-12
                return xc + s * 1e-30, acc + s
            return jax.lax.fori_loop(0, args.chain, body, (x0, 0.0))[1]

        float(chained(x))  # compile + sync
        t0 = time.time()
        for _ in range(args.reps):
            float(chained(x))
        return (time.time() - t0) / args.reps / args.chain * 1000

    # correctness pin at this shape before timing anything
    xs = x[:4]
    want = jax.lax.top_k(xs, args.k)
    for g in (4, 12, 24, 47):
        got = top_k_exact(xs, args.k, groups=g)
        assert (np.array_equal(np.asarray(want[0]), np.asarray(got[0]))
                and np.array_equal(np.asarray(want[1]), np.asarray(got[1]))), g
    print("exactness ok (values+indices vs lax.top_k at G in 4/12/24/47)")

    for g in (0, 4, 8, 12, 16, 24, 32, 47, 64, 96):
        if g and args.n < g * args.k:
            continue
        label = "flat lax.top_k" if g == 0 else f"G={g}"
        print(f"{label:>16}: {timed(g):7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
