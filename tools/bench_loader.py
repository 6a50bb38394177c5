#!/usr/bin/env python
"""Host input-pipeline throughput: the real threaded DetLoader over a
synthetic VOC tree (no TPU involved; the reference's analogue is the
torch DataLoader worker pool, /root/reference/lib/datasets/__init__.py:14-27).

Reproduces the BENCH_NOTES "host pipeline" table:

    python tools/bench_loader.py                 # native C++ fused sampler
    ODTPU_NO_NATIVE_SAMPLER=1 python tools/bench_loader.py   # pure numpy/cv2

Numbers are per-host-core-bound: this VM has 1 core; real v5e hosts
have ~100.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"  # host-only benchmark, never the TPU
from odtpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402,F401  (backend init after platform pin)
from synth import make_voc  # noqa: E402
from odtpu.data import _native, dataset_factory  # noqa: E402
from odtpu.utils.config import default_cfg, update_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--cache", action="store_true",
                    help="DATASET.CACHE_IMAGES: decoded-image RAM cache "
                         "(the warm epoch fills it)")
    args = ap.parse_args()

    root = tempfile.mkdtemp()
    make_voc(os.path.join(root, "VOCdevkit"), setname="trainval",
             n_images=args.images, seed=0)
    cfg = default_cfg()
    cfg.DATASET.DATASET_DIR = os.path.join(root, "VOCdevkit")
    cfg.DATASET.TRAIN_BATCH_SIZE = args.batch
    cfg.DATASET.TRAIN_SETS = (("2007", "trainval"),)
    cfg.DATASET.NUM_WORKERS = args.workers
    cfg.DATASET.DEVICE_PHOTOMETRIC = True  # production train path
    cfg.DATASET.CACHE_IMAGES = bool(args.cache)
    update_cfg(cfg)
    loader = dataset_factory("train", cfg)

    for b in loader:  # warm epoch (caches, thread spin-up, .so build)
        pass
    t0 = time.time()
    n = 0
    for _ in range(args.epochs):
        for b in loader:
            n += b["images"].shape[0]
    dt = time.time() - t0
    print("host train loader: {:.0f} img/s  ({} images, {} workers, "
          "native_sampler={}, cache={})".format(
              n / dt, n, args.workers, _native.available,
              loader.dataset.image_cache.stats() if args.cache else False))


if __name__ == "__main__":
    main()
