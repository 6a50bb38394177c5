"""2-process jax.distributed smoke: sharded eval loader + host-side
result allgather + make_array_from_process_local_data.

The reference has no multi-process story at all (torch DataParallel is
single-process, /root/reference/train.py:62); this locks down odtpu's
multi-host contract: each process evaluates a disjoint 1/world slice of
the test set and still reports the identical full-set mAP.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from odtpu.parallel import allgather_host_rows
from synth import make_voc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_allgather_host_rows_single_process_identity():
    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = allgather_host_rows(rows)
    assert np.array_equal(out, rows)
    assert allgather_host_rows(np.zeros((0, 7), np.float32)).shape == (0, 7)


def test_two_process_sharded_eval(tmp_path):
    make_voc(str(tmp_path / "VOCdevkit"), n_images=6, seed=11)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = REPO + os.pathsep + os.path.join(REPO, "tests")
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             "--rank", str(rank), "--world", "2", "--coord", coord,
             "--root", str(tmp_path / "VOCdevkit"),
             "--out", str(tmp_path / f"out{rank}")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST_OK rank={rank} mAP=1.0000" in out, out


def test_scatter_rows_grouped_merge():
    """EvalVOC._scatter_rows (the multihost merge) must equal the naive
    per-row append: same arrays per (cls, pos), incoming order kept
    within each group, untouched slots left empty."""
    from odtpu.eval.evaluator import EvalVOC

    class _FakeLoader:
        num_items = 5
        dataset = None

    class _Cfg:
        pass

    ev = EvalVOC.__new__(EvalVOC)  # skip __init__ (needs cfg/loader)
    ev.loader = _FakeLoader()
    ev.num_classes = 4
    rng = np.random.RandomState(0)
    n = 400
    merged = np.concatenate([
        rng.randint(0, 5, (n, 1)).astype(np.float32),      # pos
        rng.randint(1, 4, (n, 1)).astype(np.float32),      # cls
        rng.rand(n, 5).astype(np.float32)], axis=1)        # x1..score

    # oracle: the naive O(N^2) append
    want = [[np.zeros((0, 5), np.float32) for _ in range(5)]
            for _ in range(4)]
    for row in merged:
        pos, cls = int(row[0]), int(row[1])
        want[cls][pos] = np.concatenate(
            [want[cls][pos], row[None, 2:]], 0).astype(np.float32)

    ev.reset_results()
    ev._scatter_rows(merged)
    for cls in range(1, 4):
        for pos in range(5):
            np.testing.assert_array_equal(ev.results[cls][pos],
                                          want[cls][pos])
    # empty gather is a no-op
    ev.reset_results()
    ev._scatter_rows(np.zeros((0, 7), np.float32))
    assert all(r.size == 0 for c in ev.results for r in c)
