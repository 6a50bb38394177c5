#!/usr/bin/env python
"""Print a compact loss/mAP table from a training run's TB event dir.

The reference eyeballs TensorBoard for this (visualize_utils.py TBWriter
scalars); this prints the same curves as text so run evidence can be
committed (BENCH_NOTES tables are generated with it).

Usage: python tools/summarize_run.py logs/tests_flagship_synth [--every 1000]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--every", type=int, default=1000,
                   help="loss sampling stride in iterations")
    args = p.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(args.logdir)
    ea.Reload()
    tags = ea.Tags()["scalars"]

    loss = {e.step: e.value for t in tags if t == "train/loss"
            for e in ea.Scalars(t)}
    maps = {e.step: e.value for t in tags if t.startswith("mAP")
            for e in ea.Scalars(t)}
    ips = [e.value for t in tags if t == "train/img_per_sec"
           for e in ea.Scalars(t)]

    first = min(loss) if loss else None
    steps = sorted(set(s for s in loss if s % args.every == 0
                       or s == first) | set(maps))
    print("| iter | train loss | held-out mAP@0.5 |")
    print("|---|---|---|")
    for s in steps:
        lv = "{:.4f}".format(loss[s]) if s in loss else ""
        mv = "{:.4f}".format(maps[s]) if s in maps else ""
        print("| {} | {} | {} |".format(s, lv, mv))
    if ips:
        import numpy as np
        print("\nimg/s over {} windows: median {:.0f}, p10 {:.0f}, "
              "p90 {:.0f}".format(len(ips), np.median(ips),
                                  np.percentile(ips, 10),
                                  np.percentile(ips, 90)))


if __name__ == "__main__":
    main()
