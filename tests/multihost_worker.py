"""Worker process for the 2-process distributed-eval smoke test.

Launched by tests/test_multihost.py via subprocess. Each process:
  1. joins a jax.distributed CPU cluster (2 processes x 2 cpu devices),
  2. builds the eval loader through dataset_factory — which shards the
     test set across processes (odtpu/data/__init__.py),
  3. runs the VOC eval solver with a perfect fake detector; the
     end-of-loop allgather_host_rows merge must reassemble the full
     result set on every process -> mAP exactly 1.0 on both ranks,
  4. smoke-tests shard_batch's make_array_from_process_local_data path
     on the global 4-device mesh (odtpu/parallel/mesh.py:84-98).
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--coord", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=args.coord,
                               num_processes=args.world,
                               process_id=args.rank)
    assert jax.process_count() == args.world
    assert len(jax.devices()) == 2 * args.world

    import numpy as np
    from odtpu.data import dataset_factory
    from odtpu.eval import eval_solver_factory
    from odtpu.utils.config import default_cfg, update_cfg

    cfg = default_cfg()
    cfg.DATASET.DATASET_DIR = args.root
    cfg.DATASET.EVAL_BATCH_SIZE = 2
    cfg.DATASET.NUM_WORKERS = 1
    update_cfg(cfg)
    loader = dataset_factory("eval", cfg)
    ds = loader.dataset
    solver = eval_solver_factory(loader, cfg, args.out)

    # this process visits global indices rank::world in order
    visited = list(range(args.rank, loader.num_items, args.world))
    dets_by_idx = {}
    for gi in visited:
        rec = ds[gi]
        h, w, _ = rec["extra"]
        rows = [(b[0], b[1], b[2], b[3], l)
                for b, l in zip(rec["boxes"], rec["labels"])]
        dets_by_idx[gi] = rows
    bs = loader.batch_size
    call = {"n": 0}

    def fake_step(params, batch_stats, images):
        b = images.shape[0]
        out = np.zeros((b, 21, 200, 5), np.float32)
        for k in range(b):
            li = call["n"] * bs + k
            if li >= len(visited):
                continue
            for j, (x1, y1, x2, y2, l) in enumerate(dets_by_idx[visited[li]]):
                out[k, int(l) + 1, j] = (0.9, x1, y1, x2, y2)
        call["n"] += 1
        return out

    res, (mAP,) = solver.validate(fake_step, params=None)
    assert abs(mAP - 1.0) < 1e-6, f"rank {args.rank}: mAP {mAP}"
    # sharded loader really did split the work
    assert call["n"] == len(loader), (call["n"], len(loader))
    assert len(visited) < loader.num_items

    # multi-process global-batch assembly
    from odtpu.parallel import make_mesh, shard_batch
    mesh = make_mesh()  # all 4 global devices on the data axis
    local = {"x": np.full((2, 4), args.rank, np.float32)}
    garr = shard_batch(local, mesh)
    assert garr["x"].shape == (2 * args.world, 4), garr["x"].shape

    print(f"MULTIHOST_OK rank={args.rank} mAP={mAP:.4f}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
