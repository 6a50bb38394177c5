#!/usr/bin/env python
"""Generate the full-size synthetic VOC used by the flagship training
run (no real datasets / zero egress in this environment).

Images are 300-500 px with class-colored solid rectangles on noise
(tests/synth.py), so the 21-class detection task is genuinely learnable
and a rising held-out mAP through the real eval solver is meaningful.
The reference's product run is train.py on VOC 07+12
(/root/reference/train.py:44, schedule lib/utils/config.py:132-172);
this tree is its stand-in at the same input scale.

Usage: python tools/make_flagship_data.py [--root data/synthdevkit]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=osp.join(REPO, "data", "synthdevkit"))
    p.add_argument("--train_images", type=int, default=3000)
    p.add_argument("--test_images", type=int, default=500)
    p.add_argument("--min_size", type=int, default=300)
    p.add_argument("--max_size", type=int, default=500)
    p.add_argument("--suffix", default="",
                   help="VOC split-name suffix (e.g. '512' writes "
                        "synthtrain512/synthtest512) so several input "
                        "scales coexist in one devkit — the SSD512 "
                        "contract uses 450-750 px sources to match the "
                        "512x512 aug geometry instead of upsampling the "
                        "300-500 px flagship tree")
    p.add_argument("--coco", action="store_true",
                   help="emit a synthetic COCO tree (80 real category "
                        "ids, train2014 + val2014 splits) instead of "
                        "VOC — the COCO training contract's dataset "
                        "(cfgs/tests/coco_synth.yml); --root defaults "
                        "to data/synthcoco in this mode")
    args = p.parse_args()

    t0 = time.time()
    if args.coco:
        from synth import make_coco_learnable
        root = args.root
        if root == osp.join(REPO, "data", "synthdevkit"):
            root = osp.join(REPO, "data", "synthcoco")
        make_coco_learnable(root, split="train2014",
                            n_images=args.train_images, seed=11)
        # disjoint image-id range so train/val never alias
        make_coco_learnable(root, split="val2014",
                            n_images=args.test_images, seed=12,
                            start_id=500000)
    else:
        from synth import make_voc
        root = args.root
        # distinct seeds and id ranges per suffix so scale variants
        # neither alias each other's files nor share image content
        seed_base = 1 if not args.suffix else 100 + len(args.suffix)
        id_base = 0 if not args.suffix else 700000
        make_voc(root, year="2007", setname="synthtrain" + args.suffix,
                 n_images=args.train_images, seed=seed_base,
                 start_id=id_base,
                 min_size=args.min_size, max_size=args.max_size)
        # disjoint id range so train/test never alias an image file
        make_voc(root, year="2007", setname="synthtest" + args.suffix,
                 n_images=args.test_images, seed=seed_base + 1,
                 start_id=id_base + 500000,
                 min_size=args.min_size, max_size=args.max_size)
    print("wrote {} train + {} test images under {} in {:.1f}s".format(
        args.train_images, args.test_images, root, time.time() - t0))


if __name__ == "__main__":
    main()
