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
    from odtpu.parallel import allgather_host_rows, make_mesh, shard_batch
    mesh = make_mesh()  # all 4 global devices on the data axis
    local = {"x": np.full((2, 4), args.rank, np.float32)}
    garr = shard_batch(local, mesh)
    assert garr["x"].shape == (2 * args.world, 4), garr["x"].shape

    # the REAL jitted eval step must consume the host-local batches the
    # sharded loader produces (make_eval_step switches to a host-local
    # jit when process_count > 1 — a global-mesh jit cannot): run the
    # full solver loop with a tiny real model end-to-end
    from odtpu.models import init_model, model_factory
    from odtpu.parallel import create_train_state, make_eval_step
    tcfg = default_cfg()
    tcfg.DATASET.DATASET_DIR = args.root
    tcfg.DATASET.EVAL_BATCH_SIZE = 2
    tcfg.DATASET.NUM_WORKERS = 1
    tcfg.TPU.COMPUTE_DTYPE = "float32"
    tcfg.DATASET.IMAGE_SIZE = (64, 64)
    tcfg.MODEL.IMAGE_SIZE = (64, 64)
    tcfg.MODEL.STEPS = [8, 16, 32, 64]
    tcfg.MODEL.MIN_SIZES = [8, 16, 32, 48]
    tcfg.MODEL.MAX_SIZES = [16, 32, 48, 64]
    tcfg.MODEL.ASPECT_RATIOS = [[2], [2], [2], [2]]
    tcfg.MODEL.EXTRAS = [128, "S", 256, 64, "S", 128]
    update_cfg(tcfg)
    model, priors, _ = model_factory("eval", tcfg)
    # params committed to the GLOBAL mesh, as train.py produces them
    state, _ = create_train_state(model, tcfg, mesh=mesh)
    eval_fn = make_eval_step(model, priors, tcfg, mesh=mesh)
    loader2 = dataset_factory("eval", tcfg)
    solver2 = eval_solver_factory(loader2, tcfg, args.out + "_real")
    solver2.validate(eval_fn, state.params, state.batch_stats)
    # every image evaluated exactly once across the world
    local_imgs = solver2.last_timing["images"]
    total = allgather_host_rows(
        np.full((1, 1), local_imgs, np.float32))[:, 0].sum()
    assert int(total) == loader2.num_items, (total, loader2.num_items)

    # 2-process TRAIN step: each rank contributes its local half of the
    # global batch; the jitted SPMD update all-reduces gradients across
    # the process boundary (the DCN path on real multi-slice hardware).
    # Both ranks must observe the identical global loss every step.
    # (The reference's only parallelism is its train path, train.py:62;
    # this is odtpu's distributed analogue, never executed before r3.)
    from odtpu.parallel import make_train_step
    tstate, ttx = create_train_state(model, tcfg, mesh=mesh,
                                     rng=jax.random.PRNGKey(1))
    step = make_train_step(model, priors, tcfg, ttx, mesh=mesh,
                           donate=False)
    trng = np.random.RandomState(100 + args.rank)  # DIFFERENT per rank
    B_local = 2
    images = trng.rand(B_local, 64, 64, 3).astype(np.float32)
    boxes = np.zeros((B_local, tcfg.DATASET.MAX_BOXES, 4), np.float32)
    labels = np.full((B_local, tcfg.DATASET.MAX_BOXES), -1, np.int64)
    for i in range(B_local):
        boxes[i, 0] = (0.2, 0.2, 0.7, 0.7)
        labels[i, 0] = trng.randint(0, 20)
    batch = shard_batch((images, boxes, labels), mesh)
    losses = []
    for _ in range(3):
        tstate, metrics = step(tstate, *batch)
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all(), losses
    both = allgather_host_rows(np.asarray([losses], np.float32))
    assert both.shape == (args.world, 3)
    np.testing.assert_allclose(both[0], both[1], rtol=0, atol=0,
                               err_msg="ranks disagree on the global loss")

    print(f"MULTIHOST_OK rank={args.rank} mAP={mAP:.4f} "
          f"train_losses={losses}")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
